package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `Skew.saltedEquiJoin`: the explicit skew rewrite must change task
  * placement ONLY — never the joined rows. q95 pins the whole-query answer
  * against the plain-join oracle; these tests pin the row-level equality
  * on a deliberately skewed input (which the TPC-H-ish fixture is not)
  * and the physical properties the rewrite exists for.
  */
class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Skew

  private def skewed() = {
    import spark.implicits._
    // one heavy-hitter key (90% of left rows) + a tail; right is mid-size
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = (1 to 50).map(i => (i.toLong, s"name_$i")).toDF("rk", "name")
    (left, right)
  }

  test("salted join returns exactly the plain inner join's rows") {
    val (left, right) = skewed()
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "rk", "name")
    val salted = Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
      .select("k", "v", "rk", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting changed the joined rows")
    // the heavy key's 900 matches all survive
    assert(salted.filter(col("k") === 1).count() === 900)
  }

  test("the join partitions on (key, salt), spreading the heavy key") {
    val (left, right) = skewed()
    val p = Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"),
      s"salt column missing from the physical join:\n$p")
    // both the key and the salt must be in the join keys (the exchange
    // hashes on both, which is the entire point of the rewrite)
    assert(p.contains("k#") && p.contains("__graft_salt"), p)
    // and the salt never reaches the output schema
    assert(!Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
      .columns.contains("__graft_salt"))
  }

  test("the heavy key's rows take MANY distinct salts (the spread is real)") {
    // a salt derived from the join key would give every copy of the heavy
    // key the SAME salt — rows still correct, spread nonexistent. Probe
    // the physical partitioning with broadcast DISABLED (under a broadcast
    // join there is no hash exchange and partition ids measure nothing):
    // count the shuffle partitions holding the heavy key's output rows.
    val (left, right) = skewed()
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE coalesces this tiny shuffle into ONE partition either way —
    // disable so partition ids reflect the (key, salt) hash
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val parts = Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
        .filter(col("k") === 1)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .distinct().as[Int].collect()
      assert(parts.length > 1,
        s"heavy key landed in ${parts.length} partition(s) — salting is not spreading")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("property: salted join equals plain join on random skewed tables") {
    import spark.implicits._
    // deterministic pseudo-random trials over varied skew shapes and salt
    // counts — row multisets must match the plain join exactly every time
    for (trial <- 1 to 5) {
      val rnd = new scala.util.Random(trial * 7919)
      val nLeft = 50 + rnd.nextInt(300)
      val keySpace = 1 + rnd.nextInt(12)
      val left = (0 until nLeft)
        .map(i => (rnd.nextInt(keySpace).toLong, i)).toDF("k", "v")
      val right = (0 until keySpace).filter(_ => rnd.nextBoolean())
        .map(i => (i.toLong, s"r$i")).toDF("rk", "name")
      val salts = 1 + rnd.nextInt(6)
      val plain = left.join(right, col("k") === col("rk"))
        .select("k", "v", "rk", "name")
      val salted = Skew.saltedEquiJoin(left, right, "k", "rk", salts)
        .select("k", "v", "rk", "name")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"trial $trial (nLeft=$nLeft keySpace=$keySpace salts=$salts): rows differ")
    }
  }

  test("salt assignment is deterministic: identical task placement across runs") {
    // the salt is a pure function of row content (xxhash64 over every left
    // column), so a row's shuffle partition must be IDENTICAL across two
    // independent executions — the property that keeps a fetch-failure
    // retry at 100 TB task-local instead of triggering Spark's
    // indeterminate-stage rollback. Probe via the output rows' physical
    // partition ids (broadcast + AQE coalesce disabled, as above, so the
    // ids reflect the (key, salt) hash exchange).
    val (left, right) = skewed()
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      def placement(): Map[(Long, Int), Int] =
        Skew.saltedEquiJoin(left, right, "k", "rk", salts = 8)
          .select(col("k").cast("long"), col("v").cast("int"),
            org.apache.spark.sql.functions.spark_partition_id().as("p"))
          .as[(Long, Int, Int)].collect()
          .map { case (k, v, p) => (k, v) -> p }.toMap
      def placementFrom(l: org.apache.spark.sql.DataFrame): Map[(Long, Int), Int] =
        Skew.saltedEquiJoin(l, right, "k", "rk", salts = 8)
          .select(col("k").cast("long"), col("v").cast("int"),
            org.apache.spark.sql.functions.spark_partition_id().as("p"))
          .as[(Long, Int, Int)].collect()
          .map { case (k, v, p) => (k, v) -> p }.toMap
      val first = placement()
      val second = placement()
      assert(first === second,
        "row -> shuffle partition placement changed between runs — salt is not content-deterministic")
      // and the placement is a real spread, not all-one-partition
      assert(first.values.toSet.size > 1, s"all rows in one partition: $first")
      // stronger: the salt must depend ONLY on row content, so re-laying
      // the left input out (a round-robin repartition moves every row to
      // a different task and position) must not move any OUTPUT row's
      // partition — an id- or position-derived salt fails exactly here,
      // which is the local stand-in for "a task recomputation reassigns
      // salts" (unobservable directly in a single-JVM test)
      val relaid = placementFrom(left.repartition(7))
      assert(relaid === first,
        "input layout changed output placement — salt is position-derived, not content-derived")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("salts = 1 degenerates to the plain join; reserved column rejected") {
    val (left, right) = skewed()
    // only the heavy key matches (tail keys 901..1000 exceed the dim's 50)
    assert(Skew.saltedEquiJoin(left, right, "k", "rk", salts = 1).count() === 900)
    val bad = left.withColumnRenamed("v", "__graft_salt")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(bad, right, "k", "rk", salts = 4)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
