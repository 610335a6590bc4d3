package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal ops' oracle contract: DuckDB 1.0 has no BLOB
  * digests, so the oracle hashes the text while Spark hashes the
  * binary payload — which only agree because every test document is
  * pure ASCII (byte and char offsets coincide, UTF-8 bytes equal the
  * string). Pin that assumption and the binary-side invariants. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("documents are ASCII, so string digests equal payload digests") {
    val nonAscii = Tables.documents(spark, sf)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII docs break the digest oracle")
    // and the binary payload really is the UTF-8 of the text
    val mismatched = Tables.documents(spark, sf)
      .filter(length(col("text").cast("binary")) =!= length(col("text"))).count()
    assert(mismatched == 0)
  }

  test("mm_frame_sample covers every payload byte exactly once") {
    val frames = Registry.queries("mm_frame_sample")(spark, sf)
    val byDoc = frames.groupBy("doc_id")
      .agg(sum("frame_bytes").as("bytes"), count(lit(1)).as("n_frames"),
        max("frame_idx").as("max_idx"))
    val joined = byDoc.join(
      Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("len")),
      "doc_id")
    // frames tile the payload: total bytes = payload length, indices dense
    assert(joined.filter(col("bytes") =!= col("len")).count() == 0)
    assert(joined.filter(col("max_idx") =!= col("n_frames") - 1).count() == 0)
  }

  test("mm_dedup partitions the corpus: copies sum to the doc count") {
    val total = Tables.documents(spark, sf).count()
    val dedup = Registry.queries("mm_dedup")(spark, sf)
    val sums = dedup.agg(sum("n_copies")).head.getLong(0)
    assert(sums == total)
    // keep_doc_id is a member of its own group (min) — spot-checkable
    // via mm_meta: every keep id carries the digest it groups
    val meta = Registry.queries("mm_meta")(spark, sf)
      .select(col("doc_id").as("keep_doc_id"), col("sha256").as("content_sha256"))
    assert(dedup.join(meta, Seq("keep_doc_id", "content_sha256"), "left_anti").count() == 0)
  }
}
