package graft

import graft.ext.{Bpe, IvfIndex, ModelStore, PcaProject, PqIndex}
import graft.queries.{ExtensionQueries6, ExtensionQueries7, ExtensionQueries10,
  ExtensionQueries64}

/** Model-artifact lifecycle (round-10 verdict task #3): a persisted model
  * must reconstruct the trained one bit-for-bit, and a query plan built
  * from the loaded model must return exactly what its trained twin does.
  */
class ModelStoreSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("IVF centroids round-trip bit-exactly through parquet") {
    val m = ExtensionQueries6.ivfModel(spark, dir)
    val r = ModelStore.roundTrip(spark, ModelStore.saveIvf, ModelStore.loadIvf)(m)
    assert(r.centroids.length == m.centroids.length)
    m.centroids.zip(r.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "centroid bits moved")
    }
  }

  test("PQ codebooks round-trip: subDim, shape, and every value") {
    val m = ExtensionQueries6.pqModel(spark, dir)
    val r = ModelStore.roundTrip(spark, ModelStore.savePq, ModelStore.loadPq)(m)
    assert(r.subDim == m.subDim && r.m == m.m && r.ksub == m.ksub)
    for (mi <- 0 until m.m; ki <- 0 until m.ksub)
      assert(java.util.Arrays.equals(m.codebooks(mi)(ki), r.codebooks(mi)(ki)),
        s"codebook ($mi,$ki) bits moved")
  }

  test("BPE merge table round-trips in rank order") {
    val m = ExtensionQueries10.bpeModel(spark, dir)
    val r = ModelStore.roundTrip(spark, ModelStore.saveBpe, ModelStore.loadBpe)(m)
    assert(r.merges == m.merges)
  }

  test("PCA mean + components round-trip bit-exactly") {
    val m = ExtensionQueries7.pcaModel(spark, dir)
    val r = ModelStore.roundTrip(spark, ModelStore.savePca, ModelStore.loadPca)(m)
    assert(java.util.Arrays.equals(m.mean, r.mean))
    assert(r.components.length == m.components.length)
    m.components.zip(r.components).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "component bits moved")
    }
  }

  test("a corrupted store is rejected, not silently served") {
    intercept[RuntimeException] {
      val d = java.nio.file.Files.createTempDirectory("graft_badmodel")
      try {
        // a PCA store with no mean row
        val m = PcaProject.Model(Array(1.0, 2.0), Array(Array(0.5, 0.5)))
        ModelStore.savePca(spark, d.resolve("m").toString, m)
        val rows = spark.read.parquet(d.resolve("m").toString)
        rows.filter(org.apache.spark.sql.functions.col("component_id") >= 0)
          .write.mode("overwrite").parquet(d.resolve("m2").toString)
        ModelStore.loadPca(spark, d.resolve("m2").toString)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(d)
        val ps = try walk.iterator().asScala.toSeq.reverse finally walk.close()
        ps.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("provenance stamp detects a stale index against a changed corpus") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, dir)
    val d = java.nio.file.Files.createTempDirectory("graft_prov")
    try {
      val prov = d.resolve("prov").toString
      ModelStore.saveProvenance(spark,
        prov, ModelStore.corpusFingerprint(emb, "vec_id"))
      // same corpus → fresh (order/partition-layout independent)
      ModelStore.requireFresh(spark, prov, emb.repartition(7), "vec_id")
      // any id-set change → stale, loudly
      val grew = emb.unionByName(emb.filter(col("vec_id") < 3)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      val e1 = intercept[IllegalArgumentException] {
        ModelStore.requireFresh(spark, prov, grew, "vec_id")
      }
      assert(e1.getMessage.contains("STALE"))
      val shrank = emb.filter(col("vec_id") =!= 5)
      assert(intercept[IllegalArgumentException] {
        ModelStore.requireFresh(spark, prov, shrank, "vec_id")
      }.getMessage.contains("STALE"))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(d)
      val ps = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      ps.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q285/q286/q287: persisted-model plans replay their trained twins row-for-row") {
    val pairs = Seq(
      ExtensionQueries64.q285_ivfpq_persisted(spark, dir) ->
        ExtensionQueries6.q93_ann_ivfpq(spark, dir),
      ExtensionQueries64.q286_bpe_persisted(spark, dir) ->
        ExtensionQueries10.q112_bpe_tokens(spark, dir),
      ExtensionQueries64.q287_pca_persisted(spark, dir) ->
        ExtensionQueries7.q100_pca_project(spark, dir))
    pairs.foreach { case (persisted, trained) =>
      val p = persisted.collect()
      val t = trained.collect()
      assert(p.length == t.length)
      p.zip(t).foreach { case (a, b) => assert(a == b, s"row diverged: $a vs $b") }
    }
  }
}
