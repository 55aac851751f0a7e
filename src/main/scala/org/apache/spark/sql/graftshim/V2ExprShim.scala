package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.expressions.{BucketTransform, Expression, IdentityTransform, LiteralValue, Transform}

/** Bridge to the `private[sql]` V2 expression case classes
  * ([[IdentityTransform]], [[LiteralValue]] — JVM-public but Scala-pickled
  * `private[sql]`). Connector code (partitioned writes, partition-predicate
  * DELETE) needs to pattern-match them; lives under `org.apache.spark.sql`
  * solely for access, like the sibling shims.
  */
object V2ExprShim {
  /** Column name of an identity transform; None for any other transform. */
  def identityColumn(t: Transform): Option[String] = t match {
    case id: IdentityTransform => Some(id.ref.fieldNames.mkString("."))
    case _ => None
  }

  /** (numBuckets, column) of a single-column, unsorted bucket transform
    * (`PARTITIONED BY (bucket(N, col))`); None for any other transform.
    */
  def bucketColumn(t: Transform): Option[(Int, String)] = t match {
    case b: BucketTransform if b.columns.length == 1 =>
      Some((b.numBuckets.value().asInstanceOf[Number].intValue(),
        b.columns.head.fieldNames.mkString(".")))
    case _ => None
  }

  /** Literal value of a V2 literal expression (unwrapped); None otherwise. */
  def literalValue(e: Expression): Option[Any] = e match {
    case l: LiteralValue[_] => Some(l.value)
    case _ => None
  }

  /** A V2 string literal (test/helper constructor — LiteralValue itself is
    * `private[sql]`).
    */
  def utf8Literal(s: String): Expression =
    LiteralValue(org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)

  /** A V2 long literal (test/helper constructor). */
  def longLiteral(v: Long): Expression =
    LiteralValue(v, org.apache.spark.sql.types.LongType)

  /** A V2 literal of any type, value already in Catalyst form (the
    * predicate-equivalence fuzz constructor).
    */
  def literal(v: Any, dt: org.apache.spark.sql.types.DataType): Expression =
    LiteralValue(v, dt)
}
