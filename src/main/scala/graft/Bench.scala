package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-14 bench evidence/trigger helpers, pure and spec-testable
  * (BenchSpec): the driver's 2000-char stdout tail stopped fitting the
  * per-query arrays at ~200 queries, so the FULL per-query map is also
  * WRITTEN to a committed `BENCH_LOCAL_r<N>.json` each sweep — and the
  * prior round's file feeds a third retime arm (warm > 2× the committed
  * prior record) that catches the case the ratio test is blind to: a
  * degraded window inflating cold and warm TOGETHER. */
object BenchEvidence {

  /** The retime-suspect decision (Bench.scala's sweep applies it):
    *  - RATIO arm: warm > ratio×cold beyond the absolute floor (a warm
    *    pass repeats a strict subset of cold's work, so warm > cold
    *    beyond noise means the timed passes were inflated);
    *  - HEAVY arm: warm > the absolute heavy ceiling (genuine heavies
    *    get one extra min-of-2 round regardless — if a start-of-sweep
    *    window inflated cold AND warm together the ratio arm is blind);
    *  - PRIOR arm: warm > priorRatio× the prior round's COMMITTED warm
    *    record (closes the heavy arm's sub-ceiling blind spot for any
    *    query that has a prior record). */
  def isRetimeSuspect(warmSec: Double, coldSec: Double,
                      priorWarmSec: Option[Double],
                      absSec: Double = 1.0, ratio: Double = 1.3,
                      heavySec: Double = 5.0,
                      priorRatio: Double = 2.0): Boolean =
    (warmSec > absSec && warmSec > ratio * coldSec) ||
      warmSec > heavySec ||
      priorWarmSec.exists(p =>
        warmSec > absSec && warmSec > priorRatio * p)

  /** This sweep's round number: 1 + the highest committed BENCH_r<N>
    * artifact (the driver writes BENCH_r<N>.json AFTER the sweep, so
    * during round N the tree holds up to N−1). Only the DRIVER's
    * artifacts count — our own BENCH_LOCAL file must not bump the
    * round on a same-round re-run (it just gets overwritten). */
  def currentRound(repoDir: java.io.File): Int = {
    val re = "BENCH_r(\\d+)\\.json".r
    val ns = Option(repoDir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(n) => Some(n.toInt)
        case _ => None
      })
    if (ns.isEmpty) 1 else ns.max + 1
  }

  /** Serialize the per-query evidence map (sorted names — stable
    * diffs): query → {warm_ms, cold_ms, retimed}. */
  def evidenceJson(round: Int, sf: String, hostEff: (Double, Double),
                   rows: Seq[(String, Long, Long, Boolean)]): String = {
    val qs = rows.sortBy(_._1).map { case (n, w, c, r) =>
      s""""$n":{"warm_ms":$w,"cold_ms":$c,"retimed":$r}"""
    }.mkString("{", ",", "}")
    f"""{"round":$round,"sf":"$sf","host_eff_cores":[${hostEff._1}%.1f,${hostEff._2}%.1f],"queries":$qs}"""
  }

  /** The prior round's committed warm records (seconds), for the PRIOR
    * retime arm. Empty when no BENCH_LOCAL file exists yet (the arm
    * simply stays silent — rounds before the evidence file). Parsing
    * is a two-regex scan of the file this object itself writes, so no
    * JSON library dependency enters the hot path. */
  def priorWarms(repoDir: java.io.File): Map[String, Double] = {
    val re = "BENCH_LOCAL_r(\\d+)\\.json".r
    val prior = Option(repoDir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case re(n) => Some(n.toInt -> f)
        case _ => None
      }).sortBy(-_._1).headOption.map(_._2)
    prior.fold(Map.empty[String, Double]) { f =>
      val txt = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val entry = """"([^"]+)":\{"warm_ms":(\d+)""".r
      entry.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong / 1000.0).toMap
    }
  }
}

/** Driver-run benchmark: every SparkEntry query over SPARK_GRAFT_SF_DIR,
  * JSON lines on stdout.
  *
  * Two round-1 lessons baked in:
  *  - `count()` is NOT a valid materialization for queries ending in
  *    sorts/projections (Spark elides the sort and column evaluation), so
  *    each query is forced through the noop sink, which fully evaluates
  *    every row and column but writes nothing.
  *  - the first Spark job pays JVM/codegen/session warm-up (~6s observed),
  *    so an untimed warm-up pass of every query runs before the timed one.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  // sink defeats dead-code elimination of the calibration spins
  @volatile private var spinSink: Long = 0L

  private def spin(n: Long): Unit = {
    var i = 0L; var h = 0xcbf29ce484222325L
    while (i < n) { h = (h ^ i) * 0x100000001b3L; i += 1 }
    spinSink ^= h
  }

  /** Host-noise probe (round 12): a fixed FNV spin measured single-
    * threaded and at `threads`-way parallelism. On a healthy host the
    * multi-thread wall time ≈ the single time and effective_cores ≈
    * `threads`; on a co-tenant-loaded host both inflate. Published at
    * sweep START and END because the inflation that plagued the
    * recorded heavies (q_fuzzy_join 7.6→21.0 s across rounds with a
    * proven-unchanged plan) reproduced this session as a TRANSIENT
    * host window: the identical binary+data read 20.5 s during it and
    * 7.0 s twenty minutes later, at every thread count — the drift was
    * never GC debt or plan cost. The probe makes the artifact
    * self-describing: a degraded-host sweep carries its own evidence. */
  private def hostProbe(threads: Int): (Double, Double, Double) = {
    val n = 200000000L
    spin(n / 10) // JIT warm
    val t0 = System.nanoTime(); spin(n)
    val single = (System.nanoTime() - t0) / 1e6
    val ts = (1 to threads).map(_ => new Thread(() => spin(n)))
    val t1 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val multi = (System.nanoTime() - t1) / 1e6
    (single, multi, threads * single / multi)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val host0 = hostProbe(cpus.toInt)
    println(f"""{"metric":"host","when":"start","cpus":$cpus,"spin_single_ms":${host0._1}%.0f,"spin_multi_ms":${host0._2}%.0f,"effective_cores":${host0._3}%.1f}""")
    // optional 1st arg: comma-separated query-name filter for targeted
    // isolated measurements (driver passes no args → full sweep)
    val keep: String => Boolean =
      args.lift(0).map(_.split(",").toSet)
        .getOrElse((_: String) => true)
    val qs = SparkEntry.queries.filter(kv => keep(kv._1)).toSeq.sortBy(_._1)
    // Round-4 lesson: queries that localCheckpoint intermediates leave
    // cached blocks behind that are garbage once the query completes;
    // across 48 queries × 3 passes the accumulated generations taxed
    // whichever heavy query ran next with eviction/GC stalls (observed
    // as phantom >2× in-sweep regressions that vanished in isolation).
    // Dropping unowned blocks after EVERY pass measures each query
    // against a clean block manager; artifacts a real deployment would
    // keep warm (the memoized view core / IVF index) are owned by
    // SessionCache and survive.
    def clean(): Unit = {
      graft.util.SessionCache.dropTransientBlocks(spark)
      // a full GC lets ContextCleaner reap dead shuffle files/broadcasts
      // from earlier passes and empties the old gen, so the next timed
      // pass never pays a predecessor's collection debt
      System.gc()
    }
    // Warm-up: run everything once (codegen, classloading, file listing,
    // broadcast build paths all get hot). The pass stays OUTSIDE the
    // headline timing, but since round 7 each query's warm-up duration is
    // published as the `cold` map: for the memoized families (the jaccard
    // pair view, the BPE/LM models, the IVF index, decoded media
    // features) this is the only number that includes the artifact-build
    // cost — without it, 0.03 s cache-hit readings made round-over-round
    // claims on those families unfalsifiable. A failed warm-up publishes
    // a NEGATIVE duration and joins `cold_errors` — time-to-failure must
    // never read as a plausible artifact-build speedup (round-7 advice).
    // The warm-up also drains SessionCache's access log per query: the
    // resulting artifact→queries dependency map drives mid-sweep
    // eviction below.
    graft.util.SessionCache.drainAccesses()
    val coldErrors = Seq.newBuilder[String]
    val usedKeys = scala.collection.mutable.Map.empty[String, Set[String]]
    val coldTimes = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      usedKeys(name) = graft.util.SessionCache.drainAccesses()
      if (!ok) coldErrors += name
      clean()
      name -> (if (ok) t else -t)
    }
    // Round-7 lesson: the 83-query sweep's memoized artifacts (pair view,
    // BPE/LM/PQ models, IVF stores, classifier inputs) accumulate for the
    // whole run, and the growing pinned set taxed every later timed pass
    // (common 57-query surface 27.6 s → 32.8 s with zero plan changes).
    // Fix: an artifact is kept warm only while queries that use it remain;
    // after its LAST dependent query's timed passes it is evicted. Usage
    // comes from the warm-up pass (deterministic queries → identical
    // artifact touch-set in timed passes). Eviction runs in the untimed
    // cleanup slot, so no timed pass pays for it.
    // Min of two timed passes: a single pass is exposed to one-off GC /
    // OS noise (observed inflating a 3 s query to 12 s); the minimum of
    // two is a far lower-variance estimate of the query's true cost.
    // NOTE: rounds 1-2 reported single-pass times; `queries` has been
    // min-of-2 since round 3 — cross-round comparisons should mind the
    // methodology change. `passes` records every raw pass so any other
    // statistic can be recomputed.
    //
    // Round-12 (sweep-pressure fix): with ~165 queries the in-sweep
    // reading of whichever heavy ran LATE drifted up round-over-round
    // (q_fuzzy_join 7.6→15.7→21.0 s across r9–r11 with a proven-
    // unchanged plan; the victim roamed — label_prop 9.7 s in one local
    // sweep) — accumulated old-gen debt + page-cache churn from ~150
    // predecessors, not query cost. Two countermeasures, both untimed:
    //  - TIMED ORDER IS HEAVY-FIRST (descending warm-up time from this
    //    run's own warm-up pass): the expensive queries run against the
    //    freshest JVM, the cheap tail is noise-insensitive. The
    //    published artifacts stay in sorted-name order — only the
    //    execution schedule changes.
    //  - a SETTLE BARRIER before any query whose warm-up exceeded
    //    SETTLE_THRESHOLD: two full GCs with a pause between lets the
    //    concurrent collector finish reclaiming predecessor debt
    //    before the stopwatch starts.
    val settleThreshold =
      sys.env.getOrElse("SPARK_GRAFT_SETTLE_SEC", "2.0").toDouble
    def settle(): Unit = {
      System.gc(); Thread.sleep(150); System.gc()
    }
    val coldMap = coldTimes.toMap
    val timedOrder = qs.sortBy { case (name, _) => -math.abs(coldMap(name)) }
    val lastUserTimed: Map[String, Int] = {
      val m = scala.collection.mutable.Map.empty[String, Int]
      timedOrder.zipWithIndex.foreach { case ((name, _), i) =>
        usedKeys.getOrElse(name, Set.empty).foreach(k => m(k) = i)
      }
      m.toMap
    }
    val mems = Seq.newBuilder[(String, Long, Long)]
    val timedErrors = scala.collection.mutable.Set.empty[String]
    val resultsByRun = timedOrder.zipWithIndex.map { case ((name, fn), i) =>
      val pinnedBefore = graft.util.SessionCache.pinnedBytes(spark)
      val freeBefore = spark.sparkContext.getExecutorMemoryStatus
        .values.map(_._2).sum
      val heavy = math.abs(coldMap(name)) > settleThreshold
      val times = (1 to 2).map { _ =>
        if (heavy) settle() // untimed: predecessor GC debt, not query cost
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case _: Throwable => timedErrors += name }
        val t = (System.nanoTime() - t0) / 1e9
        clean() // cleanup is untimed: it is sweep hygiene, not query cost
        t
      }
      mems += ((name, pinnedBefore, freeBefore))
      val dead =
        lastUserTimed.collect { case (k, last) if last == i => k }.toSet
      if (dead.nonEmpty) graft.util.SessionCache.evictKeys(dead)
      name -> times
    }
    // ---- outlier re-time pass (round 13) ----
    // Heavy-first scheduling (above) concentrates every heavy at sweep
    // START, so one degraded co-tenant host window inflates exactly
    // the headline queries (observed: q_link_predict 34.1 s in-sweep
    // vs 3.2 s isolated — a 10.6× artifact misstatement with a
    // proven-unchanged plan). After the main sweep — by which time a
    // transient start-of-sweep window has had the whole sweep to pass
    // — re-time the suspects with the same settle + min-of-2
    // methodology and take the min over ALL passes. A query is a
    // suspect when its warm min exceeds
    //  - 1.3× its own cold reading (a warm pass repeats a strict
    //    subset of the cold pass's work — artifact builds, file
    //    listing and codegen all land on cold — so warm > cold beyond
    //    noise means the timed passes were inflated, not the query), or
    //  - the absolute heavy ceiling (genuine heavies get one extra
    //    min-of-2 round regardless: if the start-of-sweep window
    //    inflated cold AND warm together, the ratio test is blind and
    //    only a later re-time catches it).
    // Each re-time publishes a host-probe effective-core sample taken
    // ADJACENT to it, so a reading that stays high carries in-artifact
    // evidence of whether the host — not the plan — was degraded.
    val retimeAbs =
      sys.env.getOrElse("SPARK_GRAFT_RETIME_ABS_SEC", "1.0").toDouble
    val retimeRatio =
      sys.env.getOrElse("SPARK_GRAFT_RETIME_RATIO", "1.3").toDouble
    val retimeHeavy =
      sys.env.getOrElse("SPARK_GRAFT_RETIME_HEAVY_SEC", "5.0").toDouble
    // third arm (round 14): warm > 2× the prior round's COMMITTED
    // record (BENCH_LOCAL_r<N−1>.json) — a query whose COLD pass was
    // itself inflated by a degraded window escapes the first two arms
    // (cold and warm inflate together); the prior-round record doesn't.
    val retimePriorRatio =
      sys.env.getOrElse("SPARK_GRAFT_RETIME_PRIOR_RATIO", "2.0").toDouble
    val repoDir = new java.io.File(sys.props("user.dir"))
    val priorWarm = BenchEvidence.priorWarms(repoDir)
    val suspects = resultsByRun.filter { case (name, times) =>
      BenchEvidence.isRetimeSuspect(times.min, math.abs(coldMap(name)),
        priorWarm.get(name), retimeAbs, retimeRatio, retimeHeavy,
        retimePriorRatio)
    }.sortBy { case (_, times) => -times.min }
    val retimes: Map[String, (Seq[Double], Double)] =
      suspects.map { case (name, _) =>
        val fn = SparkEntry.queries(name)
        settle()
        val eff = hostProbe(cpus.toInt)._3 // adjacent host evidence
        val times = (1 to 2).map { _ =>
          settle()
          val t0 = System.nanoTime()
          try materialize(fn(spark, sfDir))
          catch { case _: Throwable => timedErrors += name }
          val t = (System.nanoTime() - t0) / 1e9
          clean()
          t
        }
        name -> (times, eff)
      }.toMap
    // published artifacts are in sorted-name order (the summary line's
    // name-recovery contract) regardless of the execution schedule;
    // each query's warm is the min over main-sweep AND re-time passes
    val results = resultsByRun
      .map { case (name, times) =>
        name -> (times ++ retimes.get(name).map(_._1).getOrElse(Nil))
      }
      .sortBy(_._1)
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val pjson = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val cjson = coldTimes.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cerrJson =
      coldErrors.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val memRows = mems.result()
    val memJson = memRows
      .map { case (n, p, f) => s"""\"$n\":[$p,$f]""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    // Layout (round-8 end of the rounds-4..7 truncation saga): the
    // driver keeps EXACTLY the last 2000 chars of stdout (measured from
    // BENCH_r01..r07: every tail string is 2000 long), and the trailing
    // sbt "[success]" line plus "[info] " prefixes eat ~150 of them —
    // so at a 90-query surface NO named map fits in the window. Full
    // self-describing lines still print first for local use (passes,
    // cold, mem, queries — expendable), and the last two lines are
    // sized for the window: a SUMMARY with warm and cold for EVERY
    // query as integer-millisecond arrays in sorted-query-name order
    // (names are recoverable by zipping CORRECTNESS_rN.json's sorted
    // keys — identical set, stated in the line itself), then the
    // total-only line. Summary ≈ 1 KB + total ≈ 100 B: both survive.
    println(s"""{"metric":"passes","passes":$pjson,"sf":"$sfDir"}""")
    println(s"""{"metric":"cold","cold":$cjson,"cold_errors":$cerrJson}""")
    println(s"""{"metric":"mem","desc":"per-query [pinned_artifact_bytes, free_storage_bytes] before timed passes","mem":$memJson}""")
    val retimeFull = suspects.map { case (name, orig) =>
      val (nt, eff) = retimes(name)
      f""""$name":{"sweep_min_sec":${orig.min}%.3f,"retime_sec":[${
        nt.map(t => f"$t%.3f").mkString(",")}],"eff_cores_adjacent":$eff%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"retime","desc":"post-sweep re-time of suspect warms (warm>1.3x cold or >${retimeHeavy}s); published warm = min over all passes","retime":$retimeFull}""")
    println(s"""{"metric":"queries","queries":$qjson}""")
    val warmMs = results.map { case (_, v) => (v.min * 1000).round }
      .mkString("[", ",", "]")
    val coldMs = coldTimes.map { case (_, t) => (t * 1000).round }
      .mkString("[", ",", "]")
    val peakPinnedMb =
      (memRows.map(_._2).maxOption.getOrElse(0L) / 1000000.0).round
    // Round-8 lesson: the summary's name-recovery contract ("zip with
    // CORRECTNESS's sorted keys — identical set") broke the one round the
    // sets diverged: the driver's harness DROPS queries that throw, so a
    // failing family left 12 warm values that were really time-to-failure
    // with no in-artifact way to tell which. Any query that errored in
    // ANY pass (warm-up or timed) will be absent from CORRECTNESS — name
    // them explicitly so the artifact stays self-describing under partial
    // failure. Bounded: only divergent names print (normally "[]").
    val missJson = (coldErrors.result().toSet ++ timedErrors).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // host probe again at sweep END: the two effective-core samples
    // bracket the run, so a transiently-degraded host (the observed
    // cause of the roaming heavy-query inflation) is visible in the
    // 2000-char tail the driver records
    val host1 = hostProbe(cpus.toInt)
    // Round-14 (verdict ask #1): the FULL per-query evidence map no
    // longer fits the driver's 2000-char stdout tail at 222+ queries —
    // write it to a committed BENCH_LOCAL_r<N>.json so round-over-round
    // per-query regression auditing never needs a re-run. Full sweeps
    // only (a filtered ad-hoc run must not masquerade as the record).
    if (args.isEmpty) {
      val evidenceRows = results.map { case (name, v) =>
        (name, (v.min * 1000).round, (coldMap(name) * 1000).round,
          retimes.contains(name))
      }
      val out = new java.io.File(repoDir,
        s"BENCH_LOCAL_r${BenchEvidence.currentRound(repoDir)}.json")
      java.nio.file.Files.write(out.toPath,
        BenchEvidence.evidenceJson(BenchEvidence.currentRound(repoDir),
          sfDir, (host0._3, host1._3), evidenceRows)
          .getBytes("UTF-8"))
      println(s"""{"metric":"evidence_file","path":"${out.getPath}"}""")
    }
    val hostJson = f""""host_eff_cores":[${host0._3}%.1f,${host1._3}%.1f]"""
    println(s"""{"metric":"summary","order":"values_align_with_query_names_sorted_asc","n":${results.size},"warm_ms":$warmMs,"cold_ms":$coldMs,"peak_pinned_mb":$peakPinnedMb,$hostJson,"cold_errors":$cerrJson,"missing_from_correctness":$missJson}""")
    // Compact re-time evidence on its OWN line between summary and
    // total: the summary's warm/cold arrays outgrew the driver's
    // 2000-char stdout window at ~200 queries (BENCH_r12's tail starts
    // mid-array), so anything that must survive goes AFTER it. Per
    // retimed query, largest sweep reading first (capped at 8):
    // [sweep_min_ms, published_final_ms, adjacent_effective_cores] —
    // a final reading that stays high carries its own host evidence.
    val retimeTail = suspects.take(8).map { case (name, orig) =>
      val (nt, eff) = retimes(name)
      val fin = (orig ++ nt).min
      f""""$name":[${(orig.min * 1000).round},${(fin * 1000).round},$eff%.0f]"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"retimed","desc":"[sweep_min_ms,final_ms,eff_cores_adjacent] per post-sweep retimed query","queries":$retimeTail,$hostJson}""")
    // The FINAL line is the one the driver's bounded stdout window is
    // guaranteed to keep, so it must be self-sufficient for
    // round-over-round claims (round-16 ask #3): it carries the
    // start/end effective-core probes and an EFF-CORE-NORMALIZED
    // total — value · (min_eff_cores / cpus), i.e. the wall this
    // sweep would read if the host delivered every requested core
    // (linear-scaling approximation; the probes themselves stay on
    // the line so a reader can reject the approximation). A
    // round-over-round comparison cites total_norm_sec from two
    // BENCH_rN.json artifacts — never a builder-side best-of-N sweep.
    val effMin = math.min(host0._3, host1._3)
    val totalNorm = total * effMin / cpus.toDouble
    println(f"""{"metric":"total","value":$total,"unit":"sec","timing":"min_of_2_after_warmup","n_queries":${results.size},"sf":"$sfDir","cpus":$cpus,$hostJson,"total_norm_sec":$totalNorm%.1f}""")
    spark.stop()
  }
}
