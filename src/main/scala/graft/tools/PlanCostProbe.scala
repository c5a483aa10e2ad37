package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Driver plan-cost attribution (r21, guide §1): OptProbe showed several
  * heavy bench rows spend most of their time BEFORE the first task —
  * this probe splits that driver time into construction (the query
  * builder itself: eager per-call analysis of every DataFrame operator,
  * plus any construction-time actions), cache lookup
  * (CacheManager.useCachedData canonicalization), logical optimization,
  * and physical planning, then prints Catalyst's own per-rule cumulative
  * timings so a hot rule is named, not guessed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PlanCostProbe [-rules] <query> [query...]
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dumpRules = args.contains("-rules")
    // -conf:key=value args apply as session confs before probing (A/B aid)
    val confs = args.filter(_.startsWith("-conf:")).map { a =>
      val kv = a.stripPrefix("-conf:").split("=", 2); (kv(0), kv(1))
    }.toSeq
    val names = args.filterNot(_.startsWith("-")).toSeq
    require(names.nonEmpty, "pass query names")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // -bconf:key=value pairs apply at BUILDER time (static confs like
    // spark.local.dir that a live session cannot change)
    val bconfs = args.filter(_.startsWith("-bconf:")).map { a =>
      val kv = a.stripPrefix("-bconf:").split("=", 2); (kv(0), kv(1))
    }.toSeq
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    bconfs.foreach { case (k, v) => builder.config(k, v); println(s"[plancost] bconf $k=$v") }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[plancost] conf $k=$v") }
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(t => graft.Tables.table(spark, dir, t).write.format("noop").mode("overwrite").save())
    graft.Tables.events(spark, dir).write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: construction actions, codegen, stage caches
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[plancost] $name warmup failed: $e") }
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.analyzed
        val t2 = System.nanoTime()
        qe.withCachedData
        val t3 = System.nanoTime()
        qe.optimizedPlan
        val t4 = System.nanoTime()
        qe.executedPlan
        val t5 = System.nanoTime()
        (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4)
      }
      def med(f: ((Long, Long, Long, Long, Long)) => Long): Double =
        reps.map(f).sorted.apply(1) / 1e9
      println(f"PLANCOST $name%-28s construct=${med(_._1)}%6.3f analyze=${med(_._2)}%6.3f " +
        f"cacheLookup=${med(_._3)}%6.3f optimize=${med(_._4)}%6.3f physical=${med(_._5)}%6.3f")
    }
    // -loop: rebuild the first query's plan continuously for ~60 s so an
    // external sampler (jstack) can attribute construction hotspots
    if (args.contains("-loop")) {
      val fn = SparkEntry.queries(names.head)
      val counts = (1 to 4).map { _ =>
        val t0 = System.currentTimeMillis()
        var n = 0
        while (System.currentTimeMillis() - t0 < 15000) {
          fn(spark, dir).queryExecution.executedPlan
          n += 1
        }
        n
      }
      println(s"LOOP ${names.head} plans per 15s: ${counts.mkString(",")}")
    }
    // -ab: same-JVM interleaved A/B of the FIRST -conf entry on the first
    // query's construction (cross-JVM loop comparisons proved unusable:
    // the second JVM of a pair ran 2x faster than the first regardless of
    // conf). Six alternating 15 s windows, default first.
    if (args.contains("-ab") && confs.nonEmpty) {
      val (k, v) = confs.head
      val dflt = spark.conf.get(k)
      // -abexec: run the FULL query (noop sink) instead of planning only
      val exec = args.contains("-abexec")
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val out = (0 until 6).map { w =>
          spark.conf.set(k, if (w % 2 == 0) dflt else v)
          val t0 = System.currentTimeMillis()
          var n = 0
          while (System.currentTimeMillis() - t0 < 15000) {
            if (exec) fn(spark, dir).write.format("noop").mode("overwrite").save()
            else fn(spark, dir).queryExecution.executedPlan: Unit
            n += 1
          }
          (if (w % 2 == 0) "default" else "conf   ", n)
        }
        out.foreach { case (tag, n) => println(s"AB $name $tag $n ${if (exec) "execs" else "plans"}/15s") }
        spark.conf.set(k, dflt)
      }
    }
    // -floor: the per-job / per-stage fixed cost of this session shape —
    // what a 170-query suite pays ~500 times regardless of data
    if (args.contains("-floor")) {
      import org.apache.spark.sql.functions.{col => c}
      def medMs(tag: String)(body: => Unit): Unit = {
        (1 to 3).foreach(_ => body) // warm
        val reps = (1 to 15).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
        }.sorted
        println(f"FLOOR $tag%-28s p50=${reps(7)}%7.1f ms min=${reps.head}%7.1f ms")
      }
      medMs("count(range(1))") { spark.range(1).count(): Unit }
      medMs("noop(range(1))") {
        spark.range(1).write.format("noop").mode("overwrite").save()
      }
      medMs("noop(range 1M, 32p)") {
        spark.range(0, 1000000, 1, 32).write.format("noop").mode("overwrite").save()
      }
      medMs("1-shuffle groupBy") {
        spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k")
          .groupBy(c("k")).count()
          .write.format("noop").mode("overwrite").save()
      }
      medMs("2-shuffle groupBy+sort") {
        spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k")
          .groupBy(c("k")).count().orderBy(c("k"))
          .write.format("noop").mode("overwrite").save()
      }
      medMs("broadcast join tiny") {
        val a = spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k")
        val b = spark.range(97).selectExpr("id as k")
        a.join(org.apache.spark.sql.functions.broadcast(b), "k")
          .write.format("noop").mode("overwrite").save()
      }
    }
    if (dumpRules) {
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      names.foreach { name =>
        try {
          val df = SparkEntry.queries(name)(spark, dir)
          df.queryExecution.executedPlan
        } catch { case _: Throwable => () }
      }
      // top rules by cumulative time across the probed set
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    }
    spark.stop()
  }
}
