package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result under heavy skew") {
    // 90% of the large side shares one hot key
    val large = spark.range(0, 20000)
      .select((when($"id" % 10 < 9, 7L).otherwise($"id" % 100)).as("k"),
        $"id".as("payload"))
    val small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = large.join(small, Seq("k")).select($"k", $"payload", $"dim")
    val salted = Joins.saltedJoin(large, small, "k", 8)
      .select($"k", $"payload", $"dim")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }
}
