package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Key-set → single-column DataFrame for broadcast semi-joins, for the
  * vid types the reference supports (int and fixed-string vids —
  * src/utils/NebulaKeyUtils.h key layouts carry either). */
private[operators] object Keys {
  def frame(spark: SparkSession, vs: Seq[Any], colName: String): DataFrame = {
    import spark.implicits._
    vs.head match {
      case _: Long => vs.map(_.asInstanceOf[Long]).toDF(colName)
      case _: Int => vs.map(_.asInstanceOf[Int].toLong).toDF(colName)
      case _: String => vs.map(_.asInstanceOf[String]).toDF(colName)
      case other => throw new IllegalArgumentException(
        s"unsupported vid type ${other.getClass.getName}")
    }
  }
}
