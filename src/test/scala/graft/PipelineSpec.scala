package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks between the data-pipeline operators (dedup, similarity,
  * multimodal) that the DuckDB oracle can't express.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("minhash LSH output equals exact ngram jaccard pairs (full recall here)") {
    val exact = dedup.Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = dedup.Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhash near-dup pairs cover the highest-jaccard pairs") {
    val exact = dedup.Dedup.ngramJaccard(spark, dir)
      .filter(col("j") >= 0.97).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = dedup.Dedup.simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(sim),
      s"simhash missed high-jaccard pairs: ${exact -- sim}")
  }

  test("LSH ANN cosines agree with brute force for shared pairs") {
    val bf = similarity.Ann.bruteforceTopk(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val lsh = similarity.Ann.lshTopk(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    assert(lsh.nonEmpty)
    lsh.foreach { case (k, cs) =>
      bf.get(k).foreach(bfCs => assert(bfCs == cs, s"cosine mismatch at $k"))
    }
  }

  test("frame sampling takes every 4th frame") {
    val rows = multimodal.Multimodal.frameSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, ns) = (r.getInt(1), r.getInt(2))
      assert(ns == (nf + 3) / 4, s"doc ${r.getLong(0)}: $nf frames, $ns sampled")
    }
  }

  test("multimodal pipeline emits one feature row per document") {
    val nDocs = Tables.documents(spark, dir).count()
    val feats = multimodal.Multimodal.pipeline(spark, dir)
    assert(feats.count() == nDocs)
    assert(feats.filter(col("n_bytes") <= 0).count() == 0)
    // deterministic stub: same input → same features
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = multimodal.Multimodal.pipeline(spark, dir).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
