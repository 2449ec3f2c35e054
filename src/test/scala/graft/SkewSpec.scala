package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join, inner and left") {
    // one pathologically hot key (90% of rows) + normal keys
    val skewed = ((1 to 90).map(i => (7L, s"hot$i")) ++
      Seq((1L, "a"), (2L, "b"), (9L, "no-match"))).toDF("k", "v")
    val dim = Seq((7L, "seven"), (1L, "one"), (2L, "two")).toDF("dk", "name")

    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("v", "name").as[(String, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, col("k"), col("dk"), salts = 4)
      .select("v", "name").as[(String, String)].collect().sorted.toSeq
    assert(salted === plain)

    val plainLeft = skewed.join(dim, col("k") === col("dk"), "left")
      .select("v", "name").as[(String, Option[String])].collect().sorted.toSeq
    val saltedLeft = Skew.saltedJoin(skewed, dim, col("k"), col("dk"), 4, "left")
      .select("v", "name").as[(String, Option[String])].collect().sorted.toSeq
    assert(saltedLeft === plainLeft)
  }

  test("saltedJoin semi/anti equal the plain semi/anti joins") {
    val skewed = ((1 to 90).map(i => (7L, s"hot$i")) ++
      Seq((1L, "a"), (2L, "b"), (9L, "no-match"))).toDF("k", "v")
    val dim = Seq((7L, "seven"), (1L, "one"), (2L, "two")).toDF("dk", "name")
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = skewed.join(dim, col("k") === col("dk"), jt)
        .select("k", "v").as[(Long, String)].collect().sorted.toSeq
      val salted = Skew.saltedJoin(skewed, dim, col("k"), col("dk"), 4, jt)
        .select("k", "v").as[(Long, String)].collect().sorted.toSeq
      assert(salted === plain, s"joinType=$jt")
    }
  }

  test("saltedJoin rejects join types that duplicate unmatched build rows") {
    val a = Seq((1L, "a")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, col("k"), col("dk"), salts = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, col("k"), col("dk"), salts = 4, joinType = "full_outer")
    }
  }

  test("salt actually spreads a hot key across buckets") {
    val skewed = (1 to 100).map(i => (7L, s"r$i")).toDF("k", "v")
    val salts = skewed.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(4)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts > 1)
  }
}
