package graft

import org.apache.spark.sql.SparkSession

/** Cluster lifecycle + catalog surface.
  *
  * Mirrors the reference's `rscl` connection-list handle
  * (reference: R/rscl.R:13-40 `rscl.connect`, R/rscl.R:45-47 `rscl.close`,
  * R/rscl.R:112-118 `is.rscl`, R/rscl.R:124-137 `rscl.ls`/`rscl.ls.str`,
  * R/rscl.R:145-158 `rscl.require`). In Spark the cluster handle is the
  * `SparkSession`: one session subsumes connect/close/validate, and the
  * catalog subsumes the per-node `.GlobalEnv` listing.
  */
object Cluster {

  /** Open a session ≈ `rscl.connect` (reference R/rscl.R:13-40).
    * `nodes` maps to local threads here; on a real cluster the same code
    * runs unchanged under spark-submit with `--master yarn/k8s`.
    */
  def open(
      nodes: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft",
      shufflePartitions: Int = 32,
      extraConf: Map[String, String] = Map.empty
  ): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$nodes]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the events fixture stores TIMESTAMP(NANOS), which the vectorized
      // parquet reader rejects — read nanos as long, session-wide, so
      // loaders stay side-effect-free (Tables.events truncates to micros)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** ≈ `rscl.close` (reference R/rscl.R:45-47). */
  def close(spark: SparkSession): Unit = spark.stop()

  /** ≈ `is.rscl` (reference R/rscl.R:112-118): handle validity. */
  def isValid(spark: SparkSession): Boolean =
    spark != null && !spark.sparkContext.isStopped

  /** ≈ `rscl.ls` (reference R/rscl.R:124-126): the names visible to
    * queries — temp views + catalog tables.
    */
  def ls(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** ≈ `rscl.ls.str` (reference R/rscl.R:131-137): name → structure. */
  def lsStr(spark: SparkSession): Map[String, String] =
    ls(spark).map(n => n -> spark.table(n).schema.treeString).toMap

  /** ≈ `rscl.assign` (reference R/rscl.R:80-89): make one value visible
    * to every node. In Spark that is a broadcast variable — shipped once
    * per executor, torrent-distributed, not once per task.
    */
  def assign[T: scala.reflect.ClassTag](
      spark: SparkSession,
      value: T
  ): org.apache.spark.broadcast.Broadcast[T] =
    spark.sparkContext.broadcast(value)

  /** ≈ `rscl.require` (reference R/rscl.R:145-158). The engine is
    * compiled into the application jar, so per-node package loading is a
    * no-op; kept for API parity and returns whether the class is present.
    */
  def require(spark: SparkSession, className: String): Boolean =
    try { Class.forName(className); true }
    catch { case _: ClassNotFoundException => false }
}
