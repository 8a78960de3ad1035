package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingSet

class TrainingSetSpec extends AnyFunSuite {
  import TestSpark.spark

  test("build yields a zero report on an empty corpus instead of throwing") {
    // a fully filtered shard or empty source partition is routine at
    // scale; sum() over zero rows is null and must not NPE the report
    val dir = java.nio.file.Files.createTempDirectory("graft-build-empty").toString
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").limit(0)
      .write.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-build-empty-out").toString
    val r = TrainingSet.build(spark, dir, out)
    assert(r == TrainingSet.BuildReport(0, 0, 0, 0, 0, 0, 0, 0, 0), s"got $r")
  }

  test("build materializes a consistent training set from the sf0.001 corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft-build").toString
    val r = TrainingSet.build(spark, TestSpark.sf0001, out)

    // the funnel only narrows
    assert(r.rawDocs >= r.qualityDocs && r.qualityDocs >= r.repetitionDocs
      && r.repetitionDocs >= r.dedupDocs && r.dedupDocs >= r.decontaminatedDocs,
      s"stages must be monotone: $r")
    assert(r.decontaminatedDocs == r.trainDocs + r.validationDocs + r.testDocs,
      s"splits must partition the survivors: $r")
    assert(r.trainDocs > 0 && r.testDocs > 0, s"fixture must populate the splits: $r")

    val train = spark.read.parquet(s"$out/train")
    val test = spark.read.parquet(s"$out/test")
    // artifact invariants: no duplicate content anywhere, splits disjoint
    val all = train.unionByName(test).unionByName(spark.read.parquet(s"$out/validation"))
    assert(all.count() == r.decontaminatedDocs)
    assert(all.select("content_md5").distinct().count() == all.count(),
      "dedup stage must leave no duplicate content in the artifact")
    assert(train.join(test, "doc_id").count() == 0, "splits must be disjoint")
    // decontamination: no train doc shares an 8-shingle with the test split
    val sh = (df: org.apache.spark.sql.DataFrame) => df
      .select(explode(graft.plans.ShingleHashes
        .shingleHashes(split(col("text"), " "), 8)).as("shash")).distinct()
    assert(sh(train).join(sh(test), "shash").count() == 0,
      "no train document may share an 8-shingle with the eval split")
    // every quality score clears the gate
    assert(all.filter(col("quality") < 0.6).count() == 0)

    // manifest addresses exactly the train docs, one slot per doc
    val manifest = spark.read.parquet(s"$out/manifest")
    assert(manifest.count() == r.trainDocs)
    assert(manifest.select("doc_id").distinct().count() == r.trainDocs)
    assert(manifest.select("bin").distinct().count() == r.manifestBins)
    // bins respect the 256-token budget for the non-straddling slots:
    // each doc's offset is its predecessors' token sum within the bin
    val bad = manifest.filter(col("bin_offset") >= 256 || col("bin_offset") < 0)
    assert(bad.count() == 0, "bin offsets must lie inside the token budget")
  }
}
