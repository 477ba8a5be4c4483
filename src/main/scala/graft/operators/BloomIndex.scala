package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persisted Bloom membership index — the map-side pre-filter for "is
  * this already in the corpus?" at 100 TB.
  *
  * An incremental ingest dedups a small batch against a standing corpus
  * of billions of content hashes. Equi-joining the batch against the raw
  * corpus shuffles (or at best fully scans) the huge side on EVERY
  * ingest; instead a Bloom filter over the corpus hashes is built ONCE
  * distributed (`df.stat.bloomFilter` runs as a treeAggregate — the
  * driver only ever holds the final filter, whose size is bits-per-item,
  * not data: ~1.2 GB per 10^9 hashes at 1% fpp), PERSISTED next to the
  * hash index, and broadcast so every batch row is marked map-side.
  * A row the bloom rejects is DEFINITELY new — it never joins at all;
  * only might-contain candidates (the true duplicates plus ~fpp of the
  * batch) take the confirming equi-join against the stored hash index,
  * making the expensive path candidate-proportional instead of batch- or
  * corpus-proportional.
  *
  * Reference shape: the ledger-style "seen before?" gates in the ingest
  * DAGs (ref: `dags/dataswm/servicenow_api_extract.py:78-117` arrival
  * checks; `file_ingest_ledger` semantics in SURVEY §2.1-S4) — here
  * generalized from file names to content hashes.
  */
object BloomIndex {

  /** Distributed build over a LongType hash column. `expectedItems`
    * sizes the filter (defaults to a count pass — at scale pass the
    * known index cardinality instead to skip it). */
  def buildLongBloom(index: DataFrame, hashCol: String, fpp: Double,
                     expectedItems: Option[Long] = None): BloomFilter = {
    val n = expectedItems.getOrElse(index.count())
    index.stat.bloomFilter(hashCol, math.max(n, 1L), fpp)
  }

  /** Persist the filter's serialized form (Hadoop FS — same namespace
    * as the index parquet it accompanies). */
  def save(spark: SparkSession, bf: BloomFilter, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  def load(spark: SparkSession, path: String): BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Broadcast the filter ONCE per loaded index — every membership test
    * against the same filter must share this handle. A fresh broadcast
    * per test would strand one full filter image (~GBs at corpus scale)
    * in block storage per ingest until the context dies. */
  def broadcastBloom(spark: SparkSession,
                     bf: BloomFilter): org.apache.spark.broadcast.Broadcast[BloomFilter] =
    spark.sparkContext.broadcast(bf)

  /** Membership test column over a long hash against a shared broadcast
    * handle. NULL hashes test false (a NULL is not a member). */
  def mightContainLong(bc: org.apache.spark.broadcast.Broadcast[BloomFilter],
                       hash: Column): Column = {
    val f = udf((h: java.lang.Long) =>
      h != null && bc.value.mightContainLong(h))
    f(hash)
  }

  /** Mark each batch row new-vs-duplicate against a persisted hash
    * index. `batch` must already carry the hash as `hashCol`, computed
    * IDENTICALLY to the index side; `indexHashes` is the stored index
    * projected to that one column. Output: the batch frame plus
    * `is_new` (true = content hash absent from the corpus). A NULL hash
    * is its own identity — it matches nothing and comes back new,
    * mirroring SQL equality semantics.
    *
    * PRECONDITION: `idCol` must be unique within `batch`. The confirmed
    * set is joined back to the batch by id, and a duplicated id would
    * fan that join out (each batch row once per confirmed copy). The
    * confirmed side is deduplicated below so the output cardinality
    * stays exactly `batch`'s even if a caller violates this — but with
    * duplicate ids every copy shares one verdict, which is only correct
    * when copies share the hash too. Give rows a real identity first.
    *
    * Plan shape: one broadcast-UDF filter over the batch (no shuffle),
    * then a semi-join of ONLY the candidates against the index, joined
    * back to the batch by id. */
  def markNewAgainstHashIndex(batch: DataFrame, idCol: String,
                              hashCol: String, indexHashes: DataFrame,
                              bloom: org.apache.spark.broadcast.Broadcast[BloomFilter]): DataFrame = {
    val cand = batch
      .filter(mightContainLong(bloom, col(hashCol)))
      .select(col(idCol), col(hashCol))
    val confirmed = cand
      .join(indexHashes.select(col(hashCol)), Seq(hashCol), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__dup", lit(true))
    batch.join(confirmed, Seq(idCol), "left")
      .withColumn("is_new", col("__dup").isNull)
      .drop("__dup")
  }
}
