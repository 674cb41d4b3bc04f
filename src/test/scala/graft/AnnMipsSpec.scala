package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** E6 (MIPS): the norm-augmentation reduction that makes max-inner-
  * product search servable by the cosine ANN machinery (E2/E3).
  * Augment corpus x → [x, √(M²−‖x‖²)] (M = max corpus norm) and query
  * q → [q, 0]: every augmented corpus vector has norm exactly M, so
  * cos(qa, xa) = (q·x) / (‖q‖·M) — a positive monotone transform of
  * the raw dot per query — and the cosine ranking EQUALS the MIPS
  * ranking. Checked on the real corpus, not synthetic toys.
  */
class AnnMipsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("norm augmentation preserves the MIPS ranking exactly") {
    val rows = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    assert(rows.length > 50)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val m = rows.map { case (_, v) => math.sqrt(dot(v, v)) }.max
    // augmented corpus vector; augmented query just appends 0, which
    // leaves q·x unchanged — so only the corpus side needs building
    def aug(v: Array[Double]): Array[Double] =
      v :+ math.sqrt(math.max(0.0, m * m - dot(v, v)))
    val queries = rows.filter(_._1 < 5)
    for ((qid, qv) <- queries) {
      val mips = rows.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(qv, v)) }
        .sortBy { case (id, d) => (-d, id) }.map(_._1).take(10).toSeq
      val qn = math.sqrt(dot(qv, qv))
      val cosAug = rows.filter(_._1 != qid)
        .map { case (id, v) =>
          val va = aug(v)
          (id, dot(qv :+ 0.0, va) / (qn * math.sqrt(dot(va, va))))
        }
        .sortBy { case (id, c) => (-c, id) }.map(_._1).take(10).toSeq
      assert(mips == cosAug, s"query $qid: mips=$mips cosAug=$cosAug")
    }
  }

  test("E14: greedy k-center — picks distinct, selection distance " +
      "non-increasing, each pick is the true farthest point") {
    val picks = similarity.Ann.kcenterSample(spark, dir)
      .orderBy("pick").collect()
      .map(r => (r.getAs[Long]("pick"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("dist")))
    assert(picks.length == 8)
    assert(picks.map(_._2).distinct.length == 8, "centers must be distinct")
    // the greedy invariant: round r's max-min distance can only shrink
    val ds = picks.drop(1).map(_._3)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => b <= a },
      s"selection distances must be non-increasing: ${ds.toSeq}")
    // replay round 2 by hand: pick 2 must be the farthest vector from
    // the seed under the same quantized-unit cosine distance
    val rows = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) e")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(x / n * 1048576.0 + 0.5) / 1048576.0)
    }
    val us = rows.map { case (id, v) => (id, unit(v)) }
    val seedU = us.minBy(_._1)._2
    val far = us.filter(_._1 != picks.head._2)
      .map { case (id, u) =>
        (id, 1.0 - u.zip(seedU).map { case (a, b) => a * b }.sum) }
      .minBy { case (id, d) => (-d, id) }
    assert(far._1 == picks(1)._2,
      s"round-2 pick ${picks(1)._2} != hand-computed farthest ${far._1}")
  }

  test("round-15 k-center one-action rounds: no per-round cache leak") {
    // The unpersist-lag-1 restructure (one driver action per greedy
    // round) must release every per-round dist frame: after the call,
    // the only persisted RDDs are session-scoped memos (kcenter_u
    // etc.), never the k-1 round frames a leak would leave behind.
    val before = spark.sparkContext.getPersistentRDDs.size
    val p1 = similarity.Ann.kcenterSample(spark, dir).collect()
    val afterOnce = spark.sparkContext.getPersistentRDDs.size
    val p2 = similarity.Ann.kcenterSample(spark, dir).collect()
    val afterTwice = spark.sparkContext.getPersistentRDDs.size
    // first call may pin the kcenter_u memo (≤1 new entry); the second
    // call must add nothing at all
    assert(afterOnce <= before + 1,
      s"round frames leaked: $before -> $afterOnce persisted RDDs")
    assert(afterTwice == afterOnce,
      s"repeat invocation leaked: $afterOnce -> $afterTwice")
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
  }

  test("E15 MMR: λ=1 is pure relevance; λ=1/2 swaps in the diverse doc") {
    import spark.implicits._
    val s3 = math.sqrt(3) / 2
    val u = Seq(
      (0L, Seq(1.0, 0.0)),  // query (0 % 97 == 0)
      (1L, Seq(s3, 0.5)),   // rel .866, exact twin of 2
      (2L, Seq(s3, 0.5)),
      (3L, Seq(s3, -0.5)))  // rel .866 but sim to 1/2 only 0.5
      .toDF("vec_id", "u")
    def mmrPicks(lamNum: Int, lamDen: Int): Seq[Long] =
      similarity.Ann.mmrOn(spark, u, candN = 16, k = 3, lamNum, lamDen)
        .orderBy("pick").collect().map(_.getAs[Long]("vec_id")).toSeq
    // all three rel are equal (.866): λ=1 breaks ties by id — pure
    // relevance keeps the duplicate adjacent
    assert(mmrPicks(1, 1) == Seq(1L, 2L, 3L),
      "λ=1 must reduce to the relevance ranking")
    // λ=1/2: after picking 1, the exact twin scores .433-.5 < the
    // diverse doc's .433-.25 — MMR promotes coverage over redundancy
    assert(mmrPicks(1, 2) == Seq(1L, 3L, 2L),
      "λ=1/2 must penalize the duplicate")
  }

  test("E16: pruned filtered-IVF honours the label predicate and is a " +
      "subset of the exhaustive result") {
    import org.apache.spark.sql.functions._
    val all = similarity.Ann.withNorm(spark,
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").as("v"), col("label")))
    val pruned = similarity.Ann
      .ivfFilteredTopkOn(all, col("vec_id") < 10, nprobe = 4)
      .collect()
    val full = similarity.Ann
      .ivfFilteredTopkOn(all, col("vec_id") < 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(pruned.nonEmpty)
    // pre-filter semantics: every neighbor carries the query's label
    val labelOf = all.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    pruned.foreach { r =>
      assert(labelOf(r.getLong(3)) == r.get(1),
        s"neighbor ${r.getLong(3)} breaks the label filter")
    }
    // pruning narrows candidates; it never invents pairs
    assert(pruned.map(r => (r.getLong(0), r.getLong(3)))
      .forall(p => full.contains(p) ||
        // a pruned heap may surface a pair the exhaustive top-5 cut off
        pruned.count(x => x.getLong(0) == p._1) <= 5))
  }
}
