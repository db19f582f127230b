package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model quality scoring — the CCNet recipe
  * (Wenzek et al., LREC 2020) with the KenLM replaced by an in-engine
  * add-k bigram model: train token/bigram counts on a reference corpus,
  * then score every document's average bigram log-probability. Documents
  * far below the corpus-typical score are gibberish / boilerplate /
  * wrong-language; far above are degenerate repetition. Used as a
  * filtering signal next to the rule-based scores (t05/t08).
  *
  * Scale shape: training is two hash-aggregations over exploded tokens
  * (map-side partial combine collapses the Zipf head before any
  * exchange); scoring is two left joins keyed on token strings that AQE
  * broadcasts whenever the vocabulary fits (a few M rows for web text —
  * a 100 TB corpus has a bounded vocabulary, not a bounded row count).
  * On a real 100 TB run, train on a hash-sample
  * ([[Sampling.hashSample]] composes directly) — the counts converge
  * long before the full corpus is read; scoring stays full-corpus.
  */
object NgramLM {

  /** Trained model: unigram counts `(tok, c1)`, bigram counts
    * `(w1, w2, c12)`, vocabulary size, and the add-k constant. The two
    * count tables are plain DataFrames — persist them with
    * `write.parquet` to reuse a model across runs.
    */
  case class Model(
      unigrams: DataFrame,
      bigrams: DataFrame,
      vocabSize: Long,
      addK: Double
  )

  private def tokens(df: DataFrame, textCol: String) =
    df.select(explode(split(col(textCol), " ")).as("tok"))

  /** (id, w1, w2) — one row per adjacent token pair; docs with fewer
    * than two tokens emit nothing.
    */
  private def docBigrams(df: DataFrame, textCol: String, idCol: String) = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(
        col(idCol),
        explode(sequence(lit(0), size(col("_toks")) - 2)).as("_i"),
        col("_toks")
      )
      .select(
        col(idCol),
        element_at(col("_toks"), col("_i") + 1).as("w1"),
        element_at(col("_toks"), col("_i") + 2).as("w2")
      )
  }

  /** Train an add-k bigram model on `df`. `addK > 0` smooths unseen
    * bigrams: p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V).
    */
  def train(df: DataFrame, textCol: String, addK: Double = 0.1): Model = {
    require(addK > 0, s"addK must be > 0 (unseen bigrams need mass), got $addK")
    val uni = tokens(df, textCol)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c1"))
    val bi = df
      .withColumn("_row", monotonically_increasing_id())
      .transform(d => docBigrams(d, textCol, "_row"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    Model(uni, bi, uni.count(), addK)
  }

  /** Persist a trained model: count tables as parquet plus a one-row
    * meta table (vocab size, add-k). Train once on a corpus sample,
    * score every later increment against the same distribution.
    */
  def saveModel(model: Model, path: String): Unit = {
    model.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    val spark = model.unigrams.sparkSession
    import spark.implicits._
    Seq((model.vocabSize, model.addK))
      .toDF("vocab_size", "add_k")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/meta")
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").head()
    Model(
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/bigrams"),
      meta.getAs[Long]("vocab_size"),
      meta.getAs[Double]("add_k")
    )
  }

  /** Score each document: (idCol, n_bigrams, avg_logp) where avg_logp =
    * mean over the doc's bigrams of ln p(w2|w1) under `model`. Documents
    * with fewer than two tokens are omitted (they have no bigrams).
    * `avg_logp` is rounded to 4 decimals (engine-comparable aggregate).
    */
  def scoreLogProb(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: Model
  ): DataFrame = {
    val k = model.addK
    val v = model.vocabSize.toDouble
    docBigrams(df, textCol, idCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams.withColumnRenamed("tok", "w1"), Seq("w1"), "left")
      .select(
        col(idCol),
        log(
          (coalesce(col("c12"), lit(0L)).cast("double") + lit(k)) /
            (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * lit(v))
        ).as("_lp")
      )
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("_lp")), 4).as("avg_logp")
      )
  }
}
