package graft

import graft.core.{SchemaDsl, Tables}
import graft.sources.RestSource
import org.apache.spark.sql.functions._

/** Capability proofs for surface the oracle queries can't reach:
  * RDD text scan (S7), REST payload → DataFrame (S12), catalog table
  * registration (S25), driver-local handoff (A13), and the ML pipeline
  * wrapper (§2.11). */
class CapabilitiesSpec extends SparkSpec {

  test("S12: REST JSON pages parse distributed into a schema-checked frame") {
    val pages = Iterator(
      """[{"id": 1, "name": "a", "qty": 10}, {"id": 2, "name": "b", "qty": 20}]""",
      """[{"id": 3, "name": "c", "qty": 30}]""")
    val df = RestSource.fromJsonPages(spark, pages, SchemaDsl.fromSpec("id:l;name:c;qty:i"))
    assert(df.agg(sum(col("qty"))).head().getLong(0) == 60L)
    assert(df.count() == 3)
  }

  test("S7: RDD text scan feeds a typed Dataset") {
    import spark.implicits._
    val rdd = spark.sparkContext.textFile(
      "/root/reference/resources/collapsed_data_pre.csv")
    val header = rdd.first()
    val parsed = rdd.filter(_ != header)
      .map(_.stripSuffix("\r").split(",")).map(a => (a(0), a(1), a(2)))
      .toDF("memnum", "begindt", "enddt")
    assert(parsed.count() == 200)
    assert(parsed.select(countDistinct(col("memnum"))).head().getLong(0) == 46)
  }

  test("distributed external-script pipe (distributed_script_util shape)") {
    // ref: dags/dataswm/utils/distributed_script_util.py — split a large
    // input into partitions, each piped through an external script in
    // parallel. Spark analogue: rdd.pipe — one process per partition,
    // lines in/out; the partition count IS the task fan-out control.
    import spark.implicits._
    val lines = Tables.nation(spark, sf001)
      .select(col("n_name")).as[String].rdd.repartition(4)
    val piped = lines.pipe(Seq("tr", "[:upper:]", "[:lower:]")).toDF("n")
    assert(piped.count() == 25)
    assert(piped.filter(trim(col("n")) === lit("nation_0")).count() == 1)
    // and nothing upper-case survived the script
    assert(piped.filter(col("n").rlike("[A-Z]")).count() == 0)
  }

  test("S25: catalog-registered table is queryable by name and listed") {
    Tables.nation(spark, sf001).write.mode("overwrite")
      .saveAsTable("graft_nation_reg")
    assert(spark.catalog.tableExists("graft_nation_reg"))
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft_nation_reg").head().getLong(0) == 25)
    spark.sql("DROP TABLE graft_nation_reg")
  }

  test("A13: driver-local handoff round trips (collect + toLocalIterator)") {
    import spark.implicits._
    val small = Tables.region(spark, sf001).orderBy("r_regionkey")
    val collected = small.collect()
    val iterated = small.toLocalIterator()
    assert(collected.length == 5)
    var n = 0
    while (iterated.hasNext) { iterated.next(); n += 1 }
    assert(n == 5)
    // the reference's pandas-handoff shape: local rows back into a frame
    val back = spark.createDataFrame(
      spark.sparkContext.parallelize(collected.toIndexedSeq), small.schema)
    assert(back.count() == 5)
  }

  test("ML pipeline wrapper: assembler -> scaler -> seeded kmeans is deterministic") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.StandardScaler
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val pipe = new Pipeline().setStages(Array(
      new StandardScaler().setInputCol("features").setOutputCol("scaled"),
      new KMeans().setK(5).setSeed(7L).setFeaturesCol("scaled").setPredictionCol("cluster")))
    def run() = pipe.fit(emb).transform(emb)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val a = run(); val b = run()
    assert(a == b)
    assert(a.values.toSet.size == 5)
  }

  test("ML pipeline wrapper: assembler -> PCA -> polyexpand -> GLR with summary") {
    // the survey's literal §2.11 shape
    // (ref: notebooks/databricks/python/automl_linearreg_process_stocks.py:460-545)
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{PCA, PolynomialExpansion, VectorAssembler}
    import org.apache.spark.ml.regression.{GeneralizedLinearRegression, GeneralizedLinearRegressionModel}
    val df = Tables.orders(spark, sf001).select(
      col("o_totalprice").as("y"),
      (col("o_orderkey") % 97).cast("double").as("f1"),
      (col("o_custkey") % 89).cast("double").as("f2"),
      month(col("o_orderdate")).cast("double").as("f3"))
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("f1", "f2", "f3")).setOutputCol("feat"),
      new PCA().setInputCol("feat").setOutputCol("pca").setK(3),
      new PolynomialExpansion().setInputCol("pca").setOutputCol("poly").setDegree(2),
      new GeneralizedLinearRegression().setFamily("gaussian").setLink("identity")
        .setFeaturesCol("poly").setLabelCol("y").setMaxIter(10)))
    val model = pipe.fit(df)
    val glr = model.stages.last.asInstanceOf[GeneralizedLinearRegressionModel]
    // the reference reads the summary stats (aic/deviance) after fit
    assert(!glr.summary.aic.isNaN && glr.summary.deviance > 0.0)
    assert(model.transform(df).count() == df.count())
  }

  test("ml_ols_closed_form IS the GLR(gaussian, identity) fit") {
    // ties the oracled closed-form row to the real §2.11 estimator: an
    // unregularized gaussian/identity GLR on the same (x, y) pairs must
    // produce the same slope/intercept the normal equations give
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.GeneralizedLinearRegression
    val closed = graft.queries.MlQueries.queries("ml_ols_closed_form")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val flags = closed.keySet
    for (flag <- flags) {
      val pairs = Tables.lineitem(spark, sf001)
        .filter(col("l_returnflag") === flag)
        .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      val assembled = new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("feat").transform(pairs)
      val glr = new GeneralizedLinearRegression()
        .setFamily("gaussian").setLink("identity")
        .setFeaturesCol("feat").setLabelCol("y").fit(assembled)
      val (slope, intercept) = closed(flag)
      assert(math.abs(glr.coefficients(0) - slope) <= 1e-6 * math.abs(slope),
        s"$flag slope: glr=${glr.coefficients(0)} closed=$slope")
      assert(math.abs(glr.intercept - intercept) <= 1e-6 * math.abs(intercept),
        s"$flag intercept: glr=${glr.intercept} closed=$intercept")
    }
  }

  test("ml_feature_covariance eigen-spectrum matches Spark PCA explainedVariance") {
    // the oracled covariance matrix is PCA's actual input: its eigenvalue
    // proportions must equal PCA.explainedVariance. Spark uses the SAMPLE
    // covariance (n-1) where the oracled form is population (n); the
    // n/(n-1) factor below documents that relationship only — eigenvalue
    // PROPORTIONS are invariant under scalar rescaling, so the assertion
    // itself cannot distinguish the two normalizations (and need not:
    // the absolute moments are already oracle-hashed)
    import org.apache.spark.ml.feature.{PCA, VectorAssembler}
    val r = graft.queries.MlQueries.queries("ml_feature_covariance")(spark, sf001).head()
    val n = r.getLong(0).toDouble
    val f = n / (n - 1.0)
    val m = breeze.linalg.DenseMatrix(
      (r.getDouble(4) * f, r.getDouble(5) * f, r.getDouble(6) * f),
      (r.getDouble(5) * f, r.getDouble(7) * f, r.getDouble(8) * f),
      (r.getDouble(6) * f, r.getDouble(8) * f, r.getDouble(9) * f))
    val eig = breeze.linalg.eigSym(m).eigenvalues.toArray.sorted.reverse
    val props = eig.map(_ / eig.sum)
    val feats = Tables.orders(spark, sf001).select(
      (col("o_orderkey") % 97).cast("double").as("f1"),
      (col("o_custkey") % 89).cast("double").as("f2"),
      month(col("o_orderdate")).cast("double").as("f3"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("f1", "f2", "f3")).setOutputCol("feat")
      .transform(feats)
    val pca = new PCA().setInputCol("feat").setOutputCol("pca").setK(3)
      .fit(assembled)
    val ev = pca.explainedVariance.toArray
    for (i <- 0 until 3)
      assert(math.abs(ev(i) - props(i)) <= 1e-6,
        s"component $i: pca=${ev(i)} eig=${props(i)}")
  }

  test("runtime bloom filter prunes the fact side of a shuffle join") {
    // the row-level runtime-filtering half of the pruning story (io_dpp
    // proves PARTITION-level dynamic pruning): a selective filter on the
    // dim side of a shuffle join should inject a bloom filter into the
    // fact scan, so at 100 TB the fact side drops non-joining rows
    // before the exchange instead of shuffling them
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.core.Tables.lineitem(spark, sf001)
        .select("l_orderkey", "l_extendedprice")
      val dim = graft.core.Tables.orders(spark, sf001)
        .filter(col("o_orderstatus") === "P") // selective creation side
        .select("o_orderkey", "o_totalprice")
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected, plan:\n${optimized.take(4000)}")
      assert(q.collect().head.getLong(0) > 0L)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    // the runtime half of the skew story: j13 proves MANUAL salting,
    // this proves the AQE skew-join re-plan the brief's scale design
    // leans on — one key owning ~90% of the fact must be split into
    // multiple tasks without any query change
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // high-entropy pad, kept alive through the agg: without it the
      // constant-key partition compresses to almost nothing in the
      // shuffle and never crosses the skew threshold
      val fact = spark.range(300000)
        .select(col("id"),
          when(col("id") % 10 === 0, col("id") % 100).otherwise(lit(7L)).as("k"),
          md5(col("id").cast("string")).as("pad"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      val q = fact.join(dim, "k")
        .agg(sum(col("v")).as("s"), max(col("pad")).as("mp"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join, plan:\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("observedWrite: the sink's own pass yields exact metrics, no re-scan") {
    import graft.operators.DataQuality
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_test_obs/sink"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft_test_obs"))
    val o = graft.core.Tables.orders(spark, sf001)
      .filter(col("o_orderstatus") === "F")
    val got = DataQuality.observedWrite(o, Seq(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total"),
        count(when(col("o_custkey").isNull, 1)).as("null_keys"))) {
      _.write.mode("overwrite").parquet(path)
    }
    // metrics must equal what a (wasteful) post-write re-scan would say
    val back = spark.read.parquet(path)
    assert(got("n") == back.count())
    assert(got("null_keys") == 0L)
    assert(got("total") == back.agg(
      sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")).head().getDouble(0))
  }

  test("J6: the reference's 10-way rank-offset self-join ≡ the lag-window form") {
    // The literal join form (ref: automl_linearreg_process_stocks.py:100-211):
    // row_number over Date desc, then ten chained inner self-joins at
    // rank+k, each contributing a vKDayAgo column. The modern form is ONE
    // window sort (Windows.lagFeatures) — this test pins their frame
    // equality, so w4_lag_features stands in for J6 with the literal
    // capability proven, not asserted. Inner joins drop rows missing a
    // k-days-ago predecessor; the window form replicates that by
    // filtering lag-10 nulls (rank is dense, so both keep exactly the
    // rows with 10 predecessors).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val daily = graft.core.Tables.orders(spark, sf001)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
    val lags = 1 to 10
    val ranked = daily.withColumn("rn",
      row_number().over(Window.orderBy(col("d").desc)))
    val joinForm = lags.foldLeft(ranked) { (acc, k) =>
      acc.join(ranked.select(col("v").as(s"v_$k"), col("rn").as(s"rn_$k")),
          col(s"rn_$k") === col("rn") + k, "inner")
        .drop(s"rn_$k")
    }.drop("rn")
    // rank+k under a DESC rank walks toward OLDER dates — that is lag(k)
    // under an ASC date order
    val windowForm = graft.operators.Windows.lagFeatures(daily, col("v"),
        Seq(col("d").asc), lags, "v_")
      .filter(col("v_10").isNotNull)
    val cols = ("d" +: "v" +: lags.map(k => s"v_$k")).map(col)
    val a = joinForm.select(cols: _*)
    val b = windowForm.select(cols: _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
