package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Round-20 OPTIMIZATION pins — every fusion this round must be
  * result-identical to the two-pass shape it replaced:
  *
  *   - the fused audited face equals fingerprintFace (face projection)
  *     and containerAudit (audit projection) row-for-row — the kernels
  *     are shared, and this pin catches any wiring drift (wrong kind
  *     map, wrong sizeBytes fallback, column order);
  *   - the fast fused face equals fingerprintFaceFast the same way;
  *   - the fused CONTENT face equals contentFingerprintFace on the
  *     extractable rows and carries containerAudit's fmt/fidelity for
  *     EVERY row (extraction failures ride with null face columns).
  */
class Round20OptSpec extends SparkTestBase {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fused audited face: face projection equals fingerprintFace") {
    val fused = Multimodal.auditedFace(spark, Sf)
      .select("media_id", "kind", "n_bytes", "sig", "ffix")
    val ref = Multimodal.fingerprintFace(spark, Sf)
    assert(rowsOf(fused) == rowsOf(ref))
  }

  test("fused audited face: audit projection equals containerAudit") {
    val fused = Multimodal.auditedFace(spark, Sf)
      .select("media_id", "fmt", "r_parse", "r_min_pixels", "r_aspect",
        "r_rate", "r_short", "r_dominant", "keep", "fidelity")
    val ref = Multimodal.containerAudit(Multimodal.mediaWithHeaders(spark, Sf))
    assert(rowsOf(fused) == rowsOf(ref))
  }

  test("fused fast face equals fingerprintFaceFast") {
    val fused = Multimodal.auditedFace(spark, Sf, fast = true)
      .select("media_id", "kind", "n_bytes", "sig", "ffix")
    val ref = Multimodal.fingerprintFaceFast(spark, Sf)
    assert(rowsOf(fused) == rowsOf(ref))
  }

  test("fused content face equals contentFingerprintFace plus fidelityFrame") {
    val fused = Multimodal.contentAuditedFace(spark, Sf)
    // extractable rows: face columns equal the flatMap face
    val face = fused.where(col("sig").isNotNull)
      .select(col("media_id"), col("fmt").as("kind"),
        col("content_bytes").as("n_bytes"), col("sig"), col("ffix"))
    val refFace = Multimodal.contentFingerprintFace(spark, Sf)
    assert(rowsOf(face) == rowsOf(refFace))
    // every row carries the audit pass's fmt and fidelity
    val fid = fused.select("media_id", "fmt", "fidelity")
    val refFid = Multimodal.fidelityFrame(spark, Sf)
    assert(rowsOf(fid) == rowsOf(refFid))
    // the synthetic corpus always extracts; the null-face path is
    // covered by construction (Options), pin the row count matches the
    // media universe so no row is silently dropped
    assert(fused.count() ==
      spark.read.parquet(s"$Sf/documents.parquet").count())
  }

  test("decision rows read fidelity off the fused face (no second decode)") {
    val raw0 = Multimodal.rawDecodeBuilds.get
    val cont0 = Multimodal.containerDecodeBuilds.get
    val fused0 = Multimodal.fusedDecodeBuilds.get
    val df = Multimodal.nearDupDecision(spark, Sf)
    assert(df.count() > 0)
    assert(Multimodal.fusedDecodeBuilds.get - fused0 == 1)
    assert(Multimodal.rawDecodeBuilds.get - raw0 == 0)
    assert(Multimodal.containerDecodeBuilds.get - cont0 == 0)
  }

  test("content decision pays one container pass") {
    val cont0 = Multimodal.containerDecodeBuilds.get
    val df = Multimodal.contentNearDupDecision(spark, Sf)
    assert(df.count() > 0)
    // contentAuditedFace builds over mediaWithHeaders — exactly one
    // container synthesis pipeline for the whole decision
    assert(Multimodal.containerDecodeBuilds.get - cont0 == 1,
      s"container passes: ${Multimodal.containerDecodeBuilds.get - cont0}")
  }
}
