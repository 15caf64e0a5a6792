package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** r16 ADVICE / r16 VERDICT "What's wrong #4": StaticPlan.withMeasured
  * mutates session-global SQL confs around the armed body. These specs
  * pin the concurrency contract added in r17: armed regions serialize
  * on a lock, so interleaved save/restore can never leak
  * `adaptive.enabled=false` (or a tiny shuffle-partition count) into
  * the session after the operators return. */
class StaticPlanSpec extends SparkSpec {
  private val AqeKey = "spark.sql.adaptive.enabled"
  private val ShufKey = "spark.sql.shuffle.partitions"
  private val CgKey = "spark.sql.codegen.wholeStage"

  test("two concurrent armed wraps do not leak confs (serialized)") {
    val aqe0 = spark.conf.getOption(AqeKey)
    val shuf0 = spark.conf.get(ShufKey)
    val cg0 = spark.conf.getOption(CgKey)
    val pool = Executors.newFixedThreadPool(2)
    val started = new CountDownLatch(2)
    @volatile var overlapSeen = false
    @volatile var insideArmed = 0
    val tasks = (1 to 2).map { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          started.countDown()
          started.await(5, TimeUnit.SECONDS)
          // Both threads race into the armed wrap; the lock must
          // serialize them, so at most one is ever inside.
          StaticPlan.withMeasured(spark, measuredRows = 100L) { _ =>
            val n = StaticPlanSpec.synchronized { insideArmed += 1; insideArmed }
            if (n > 1) overlapSeen = true
            assert(spark.conf.get(AqeKey) == "false",
              "armed body must see AQE off")
            Thread.sleep(50L * i)
            StaticPlanSpec.synchronized { insideArmed -= 1 }
          }
        }
      })
    }
    tasks.foreach(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(!overlapSeen, "armed regions must serialize on the lock")
    assert(spark.conf.getOption(AqeKey) == aqe0,
      s"AQE leaked: ${spark.conf.getOption(AqeKey)} vs $aqe0")
    assert(spark.conf.get(ShufKey) == shuf0,
      s"shuffle.partitions leaked: ${spark.conf.get(ShufKey)} vs $shuf0")
    assert(spark.conf.getOption(CgKey) == cg0,
      s"codegen leaked: ${spark.conf.getOption(CgKey)} vs $cg0")
  }

  test("nested armed wraps restore the outer wrap's confs") {
    val shuf0 = spark.conf.get(ShufKey)
    StaticPlan.withMeasured(spark, measuredRows = 400000L) { _ =>
      val outerParts = spark.conf.get(ShufKey)
      assert(outerParts.toInt > 1, "400k rows derives >1 partition")
      StaticPlan.withMeasured(spark, measuredRows = 10L) { _ =>
        assert(spark.conf.get(ShufKey) == "1")
        assert(spark.conf.get(CgKey) == "false")
      }
      assert(spark.conf.get(ShufKey) == outerParts,
        "inner wrap must restore the outer wrap's partition count")
    }
    assert(spark.conf.get(ShufKey) == shuf0)
  }

  test("unarmed path (rows above bound) touches no conf") {
    val shuf0 = spark.conf.get(ShufKey)
    val aqe0 = spark.conf.getOption(AqeKey)
    StaticPlan.withMeasured(spark, StaticPlan.SmallRows + 1) { _ =>
      assert(spark.conf.get(ShufKey) == shuf0)
      assert(spark.conf.getOption(AqeKey) == aqe0)
    }
  }
}

object StaticPlanSpec
