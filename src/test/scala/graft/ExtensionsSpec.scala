package graft

class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions mirror the Column API expressions") {
    GraftExtensions.register(spark)

    // dot product: 1*3 + 2*4 = 11
    val dot = spark.sql(
      "SELECT graft_dotp(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(dot == 11.0)

    // FIXED_STRING(5): pad short, truncate long
    val fs = spark.sql(
      """SELECT graft_fixed_string('ab', 5) AS p,
        |       graft_fixed_string('abcdefgh', 5) AS t""".stripMargin).head
    assert(fs.getString(0) == "ab   " && fs.getString(1) == "abcde")

    // bloom round trip: members always hit; a disjoint probe set at
    // 16 bits/item false-positives rarely (assert < half, not zero)
    spark.range(1000).createOrReplaceTempView("ext_members")
    spark.sql(
      """SELECT graft_bloom_agg(xxhash64(id), 1000L, 16000L) AS bf
        |FROM ext_members""".stripMargin).createOrReplaceTempView("ext_bloom")
    val hits = spark.sql(
      """SELECT count(*) FROM ext_members
        |WHERE graft_might_contain((SELECT bf FROM ext_bloom),
        |                          xxhash64(id))""".stripMargin)
      .head.getLong(0)
    assert(hits == 1000, s"bloom must have no false negatives: $hits")
    val fps = spark.sql(
      """SELECT count(*) FROM range(1000000, 1001000) r
        |WHERE graft_might_contain((SELECT bf FROM ext_bloom),
        |                          xxhash64(r.id))""".stripMargin)
      .head.getLong(0)
    assert(fps < 500, s"false-positive rate implausibly high: $fps/1000")

    // registration is idempotent
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dotp(array(1.0D), array(2.0D))")
      .head.getDouble(0) == 2.0)
  }
}
