package graft.bench

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query execution counters — the Spark analog of the reference's
  * phase timers and DPU cycle counts (`host/timer/timer.h`,
  * `host/dpuext/perf.cc:7-18`, reported per benchmark iteration at
  * `filter_benchmark.cc:52-62`): cumulative task time (≈ "dpu work"),
  * shuffle bytes read/written (≈ copy-to/copy-from DPU), records, spills,
  * and peak execution memory across stages.
  *
  * Register once, call [[snapshot]] before/after a query, subtract.
  */
class MetricsListener extends SparkListener {
  private val taskTimeMs = new LongAdder
  // per-task jvmGCTime: at 32 concurrent tasks every stop-the-world pause
  // is charged to ALL running tasks' durations, so GC-heavy rows read as
  // anti-scaling with cores (r19 q_edit_pairs finding) — this column makes
  // that mechanism visible per query instead of inferred
  private val gcTimeMs = new LongAdder
  private val shuffleReadBytes = new LongAdder
  private val shuffleWriteBytes = new LongAdder
  private val recordsRead = new LongAdder
  private val bytesRead = new LongAdder
  private val memorySpillBytes = new LongAdder
  private val diskSpillBytes = new LongAdder
  private val nTasks = new LongAdder
  private val nStages = new LongAdder
  private val peakExecMem = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      taskTimeMs.add(m.executorRunTime)
      gcTimeMs.add(m.jvmGCTime)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      memorySpillBytes.add(m.memoryBytesSpilled)
      diskSpillBytes.add(m.diskBytesSpilled)
      peakExecMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      nTasks.increment()
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    nStages.increment()

  case class Snapshot(
      taskTimeMs: Long,
      gcTimeMs: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      recordsRead: Long,
      bytesRead: Long,
      memorySpillBytes: Long,
      diskSpillBytes: Long,
      nTasks: Long,
      nStages: Long) {
    def -(prev: Snapshot): Snapshot = Snapshot(
      taskTimeMs - prev.taskTimeMs,
      gcTimeMs - prev.gcTimeMs,
      shuffleReadBytes - prev.shuffleReadBytes,
      shuffleWriteBytes - prev.shuffleWriteBytes,
      recordsRead - prev.recordsRead,
      bytesRead - prev.bytesRead,
      memorySpillBytes - prev.memorySpillBytes,
      diskSpillBytes - prev.diskSpillBytes,
      nTasks - prev.nTasks,
      nStages - prev.nStages)
    def render: String =
      f"taskTime=${taskTimeMs}ms gc=${gcTimeMs}ms shufR=${shuffleReadBytes}B shufW=${shuffleWriteBytes}B " +
        f"recordsIn=$recordsRead bytesIn=${bytesRead}B spillMem=${memorySpillBytes}B " +
        f"spillDisk=${diskSpillBytes}B tasks=$nTasks stages=$nStages"
  }

  def snapshot(): Snapshot = Snapshot(
    taskTimeMs.sum(), gcTimeMs.sum(), shuffleReadBytes.sum(), shuffleWriteBytes.sum(),
    recordsRead.sum(), bytesRead.sum(), memorySpillBytes.sum(), diskSpillBytes.sum(),
    nTasks.sum(), nStages.sum())
}
