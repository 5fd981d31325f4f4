package graft.ext

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Persistence for the driver-trained model artifacts (round-10 verdict
  * task #3): IVF centroids, PQ codebooks, PCA components, and the BPE
  * merge table train deterministically per corpus, but a 100 TB pipeline
  * trains ONCE and serves many runs — the index is an artifact with a
  * lifecycle, not a per-query side effect. Each model round-trips
  * through a tiny parquet table (≤ m·ksub rows — hundreds of rows, a few
  * KB) with an explicit schema, so a persisted model is readable by any
  * engine that reads parquet, diffable, and versionable next to the data
  * it indexes.
  *
  * Loads reconstruct the exact in-memory `Model` case classes the
  * training path produces — doubles are stored as parquet DOUBLE (IEEE
  * 754 binary64, bit-exact round trip) — so a query built from a loaded
  * model is plan-identical to its freshly-trained twin. That equality is
  * oracle-gated: q285/q286/q287 run the q93/q112/q100 plans from a
  * saved+loaded model against mirrors embedding the TRAINED model's
  * literals, so any bit deviation introduced by the store reds the row.
  *
  * The collect in each loader is bounded by the model's own size
  * (nlist ≤ 4096, m·ksub ≤ 4096, merges ≤ 10k — enforced) — the same
  * bounded-driver-model discipline as training itself.
  */
object ModelStore {

  private val MaxModelRows = 100000

  private def write(spark: SparkSession, path: String, schema: StructType,
      rows: Seq[Row]): Unit = {
    require(rows.length <= MaxModelRows, s"model too large to persist: ${rows.length} rows")
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def read(spark: SparkSession, path: String): Array[Row] = {
    val rows = spark.read.parquet(path).collect() // ≤ MaxModelRows by construction
    require(rows.length <= MaxModelRows, s"not a persisted model: ${rows.length} rows at $path")
    rows
  }

  private def vec(r: Row, i: Int): Array[Double] = r.getSeq[Double](i).toArray

  // ------------------------------------------------------------- IVF

  private val ivfSchema = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def saveIvf(spark: SparkSession, path: String, m: IvfIndex.Model): Unit =
    write(spark, path, ivfSchema,
      m.centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }.toSeq)

  def loadIvf(spark: SparkSession, path: String): IvfIndex.Model =
    IvfIndex.Model(read(spark, path).sortBy(_.getInt(0)).map(vec(_, 1)))

  // -------------------------------------------------------------- PQ

  private val pqSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def savePq(spark: SparkSession, path: String, m: PqIndex.Model): Unit =
    write(spark, path, pqSchema,
      (for { mi <- m.codebooks.indices; ki <- m.codebooks(mi).indices }
        yield Row(mi, ki, m.codebooks(mi)(ki).toSeq)))

  def loadPq(spark: SparkSession, path: String): PqIndex.Model = {
    val rows = read(spark, path)
    val books = rows.groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getInt(1)).map(vec(_, 2)) }
    PqIndex.Model(books.head.head.length, books)
  }

  // ------------------------------------------------------------- PCA

  /** component_id -1 carries the mean; 0..k-1 the principal directions. */
  private val pcaSchema = StructType(Seq(
    StructField("component_id", IntegerType, nullable = false),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def savePca(spark: SparkSession, path: String, m: PcaProject.Model): Unit =
    write(spark, path, pcaSchema,
      Row(-1, m.mean.toSeq) +:
        m.components.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }.toSeq)

  def loadPca(spark: SparkSession, path: String): PcaProject.Model = {
    val rows = read(spark, path)
    PcaProject.Model(
      rows.find(_.getInt(0) == -1).map(vec(_, 1))
        .getOrElse(sys.error(s"persisted PCA model at $path has no mean row")),
      rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0)).map(vec(_, 1)))
  }

  // ------------------------------------------------------------- BPE

  private val bpeSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false)))

  def saveBpe(spark: SparkSession, path: String, m: Bpe.Model): Unit =
    write(spark, path, bpeSchema,
      m.merges.zipWithIndex.map { case ((a, b), i) => Row(i, a, b) })

  def loadBpe(spark: SparkSession, path: String): Bpe.Model =
    Bpe.Model(read(spark, path).sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq)

  // ------------------------------------------------------ provenance

  private val provSchema = StructType(Seq(
    StructField("corpus_rows", LongType, nullable = false),
    StructField("corpus_checksum", LongType, nullable = false)))

  /** Order-independent corpus fingerprint: (row count, sum of
    * xxhash64(id) mod 1e6+3) in ONE map-side-combined aggregate pass —
    * the cheapest scan that still moves (w.p. ≈ 1−10⁻⁶ per change) when
    * any id appears, vanishes, or duplicates. The modulus keeps the sum
    * exact in a long to ~9·10¹² rows — far past any single-table corpus
    * — with no ANSI overflow. A persisted index is only as good as its
    * match to the corpus it was trained to serve; production stores
    * stamp this beside the model and check it before serving
    * ([[requireFresh]]).
    */
  def corpusFingerprint(df: org.apache.spark.sql.DataFrame,
      idCol: String): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val r = df.agg(count(lit(1)),
      coalesce(sum(pmod(xxhash64(col(idCol)), lit(1000003L))), lit(0L)))
      .collect()(0) // 1-row agg
    (r.getLong(0), r.getLong(1))
  }

  def saveProvenance(spark: SparkSession, path: String,
      fp: (Long, Long)): Unit =
    write(spark, path, provSchema, Seq(Row(fp._1, fp._2)))

  def loadProvenance(spark: SparkSession, path: String): (Long, Long) = {
    val rows = read(spark, path)
    require(rows.length == 1, s"not a provenance stamp: ${rows.length} rows at $path")
    (rows(0).getLong(0), rows(0).getLong(1))
  }

  /** Fail fast when a persisted model's training corpus no longer
    * matches the frame it is about to serve — the staleness check a
    * train-once/serve-many lifecycle needs (a silently stale ANN index
    * degrades recall with no error anywhere else).
    */
  def requireFresh(spark: SparkSession, provPath: String,
      corpus: org.apache.spark.sql.DataFrame, idCol: String): Unit = {
    val stored = loadProvenance(spark, provPath)
    val now = corpusFingerprint(corpus, idCol)
    require(stored == now,
      s"persisted model is STALE: trained on (rows=${stored._1}, " +
        s"checksum=${stored._2}) but the corpus is now (rows=${now._1}, " +
        s"checksum=${now._2}) — retrain or point at the matching corpus")
  }

  // -------------------------------------------------- temp round-trip

  /** Save + load through a fresh temp directory, deleting it after the
    * load: the persisted==trained query shape (the model that rides into
    * the plan has physically been through parquet bytes, the files
    * themselves are transient). Production callers use the save/load
    * pairs directly against a durable path.
    */
  def roundTrip[M](spark: SparkSession,
      save: (SparkSession, String, M) => Unit,
      load: (SparkSession, String) => M)(m: M): M = {
    val dir = java.nio.file.Files.createTempDirectory("graft_model_store")
    try {
      save(spark, dir.resolve("model").toString, m)
      load(spark, dir.resolve("model").toString)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
