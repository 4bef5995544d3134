package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Incremental (CDC-lite) consumption of a ManifestTable: changedFiles /
  * readChanges version windows, the consumeChanges exactly-once relay,
  * and the V1 streaming source — each asserting BOTH halves of the
  * contract: the change set is exactly the data-changing commits' adds
  * (rewrites contribute nothing), and no window is ever double-applied
  * downstream. */
class IncrementalReadSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-incr").toString

  private def rows(df: DataFrame): Set[(String, Long, Double)] =
    df.select("day", "id", "v").as[(String, Long, Double)].collect().toSet

  private def mk(day: String, ids: Range, v: Double) =
    ids.map(i => (day, i.toLong, v)).toDF("day", "id", "v")

  test("readChanges: upsert windows emit exactly the touched partitions' merged content") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 10, 1.0).union(mk("d2", 10 until 20, 1.0)),
      root, partitionCols = Seq("day"))
    val v1 = ManifestTable.currentVersion(spark, root).get
    assert(v1 == 1L)

    // from 0: the initial snapshot IS the first change set
    assert(rows(ManifestTable.readChanges(spark, root, 0L, v1)) ==
      rows(ManifestTable.read(spark, root)))

    // upsert touching d2 only (5 replaced keys + 5 new) → delta commit
    val v2 = ManifestTable.upsertDedup(spark, mk("d2", 15 until 25, 2.0), root,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    val w12 = ManifestTable.readChanges(spark, root, v1, v2)
    // the merged d2 partition, nothing of d1
    assert(rows(w12) == rows(ManifestTable.read(spark, root).filter(col("day") === "d2")))
    assert(w12.select("day").distinct().as[String].collect().toSeq == Seq("d2"))

    // empty window
    assert(ManifestTable.readChanges(spark, root, v2, v2).count() == 0)
    // (from, to] beyond the head fails loudly, not silently empty
    intercept[RuntimeException] { ManifestTable.readChanges(spark, root, v2, v2 + 1) }
  }

  test("readChanges: compact/cluster rewrites contribute nothing; later upserts still flow") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 50, 1.0).union(mk("d2", 50 until 100, 1.0)),
      root, partitionCols = Seq("day"))
    val v1 = ManifestTable.currentVersion(spark, root).get
    val v2 = ManifestTable.compact(spark, root, targetFileMB = 1)
    assert(ManifestTable.readChanges(spark, root, v1, v2).count() == 0,
      "a compaction re-lays-out the same rows — incremental readers must not re-emit the table")
    val v3 = ManifestTable.cluster(spark, root, sortCols = Seq("id"), targetFileMB = 1)
    assert(ManifestTable.readChanges(spark, root, v2, v3).count() == 0)
    // a window SPANNING the rewrites carries only the upsert's adds
    val v4 = ManifestTable.upsertDedup(spark, mk("d3", 100 until 110, 3.0), root,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    assert(rows(ManifestTable.readChanges(spark, root, v1, v4)) ==
      mk("d3", 100 until 110, 3.0).as[(String, Long, Double)].collect().toSet)
  }

  test("readChanges: a window crossing the vacuum horizon errors loudly") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 5, 1.0), root, partitionCols = Seq("day"))
    // checkpointInterval=1 forces snapshot commits so vacuum can drop
    // the old versions outright
    for (i <- 2 to 4)
      ManifestTable.upsertDedup(spark, mk(s"d$i", i * 5 until i * 5 + 5, i.toDouble),
        root, keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"),
        checkpointInterval = 1)
    ManifestTable.vacuum(spark, root, keep = 1)
    val head = ManifestTable.currentVersion(spark, root).get
    // a consumer that fell behind the retention horizon must get an
    // ERROR (Delta-class semantics), never a silently truncated window
    val e = intercept[RuntimeException] {
      ManifestTable.readChanges(spark, root, 1L, head)
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // in-retention windows still work
    assert(ManifestTable.readChanges(spark, root, head, head).count() == 0)
    // and the documented recovery is a snapshot re-bootstrap
    assert(ManifestTable.read(spark, root).count() == 20)
  }

  test("readChanges: overwrite emits the full new content; unpartitioned upserts emit the merged table") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 5, 1.0), root)
    val v1 = ManifestTable.currentVersion(spark, root).get
    // unpartitioned upsert rewrites the whole table → whole merged content
    val v2 = ManifestTable.upsertDedup(spark, mk("d1", 3 until 8, 2.0), root,
      keys = Seq("day", "id"), order = "v")
    assert(rows(ManifestTable.readChanges(spark, root, v1, v2)) ==
      rows(ManifestTable.read(spark, root)))
    // overwrite = new data by definition
    val v3 = ManifestTable.write(mk("d9", 0 until 3, 9.0), root)
    assert(rows(ManifestTable.readChanges(spark, root, v2, v3)) ==
      mk("d9", 0 until 3, 9.0).as[(String, Long, Double)].collect().toSet)
  }

  test("incremental LSH dedup index: consumeChanges-maintained, probes without corpus rescans") {
    import graft.operators.DedupSuite
    val corpus = tmp() + "/corpus"
    val index = tmp() + "/lsh_index"
    def doc(seed: Int): String =
      (0 until 60).map(i => s"w${(seed * 131 + i * 17) % 9973}x$i").mkString(" ")
    def batchDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "body")

    // index maintenance = one incremental hop: band rows of the CHANGED
    // docs only, keyed so replays/rewrites stay idempotent
    def hopIndex(): Option[Long] =
      ManifestTable.consumeChanges(spark, corpus, index, "lshidx",
        keys = Seq("doc_id", "band", "bh"), order = "doc_id") { ch =>
        DedupSuite.minhashIndexRows(ch, "doc_id", col("body"))
      }

    // batch 1: docs 1..20
    ManifestTable.write(batchDf((1L to 20L).map(i => i -> doc(i.toInt))), corpus)
    assert(hopIndex().nonEmpty)
    // batch 2: docs 21..40 (no dups) — unpartitioned upsert rewrites the
    // table; the file-level feed re-emits it, the keyed index absorbs it
    ManifestTable.upsertDedup(spark, batchDf((21L to 40L).map(i => i -> doc(i.toInt))),
      corpus, keys = Seq("doc_id"), order = "doc_id")
    assert(hopIndex().nonEmpty)

    // batch 3 contains a planted near-dup of doc 7 (59/60 tokens shared)
    val nearDup = doc(7).split(" ").updated(30, "MUTATED").mkString(" ")
    val b3 = batchDf(Seq(41L -> nearDup, 42L -> doc(42)))
    // probe BEFORE ingesting: candidates against the whole corpus via the
    // index alone (b3 is not in the index, so no self-match exclusion
    // is even needed)
    val idx = ManifestTable.read(spark, index)
    val cands = DedupSuite.minhashProbeIndex(b3, idx, "doc_id", col("body"))
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((41L, 7L)), s"planted pair not found: $cands")
    assert(!cands.exists(_._1 == 42L), s"clean doc matched: $cands")

    // ingest batch 3, advance the index, and re-probe: the self-match
    // filter hides (41,41); the (41,7) partnership persists
    ManifestTable.upsertDedup(spark, b3, corpus, keys = Seq("doc_id"), order = "doc_id")
    assert(hopIndex().nonEmpty)
    val cands2 = DedupSuite.minhashProbeIndex(b3, ManifestTable.read(spark, index),
      "doc_id", col("body")).as[(Long, Long)].collect().toSet
    assert(cands2.contains((41L, 7L)) && !cands2.contains((41L, 41L)))
    // index size = bands per doc × docs (16 × 42), exactly once per doc
    assert(ManifestTable.read(spark, index).count() == 16L * 42)
  }

  test("idempotentUpsert: re-run batch jobs apply exactly once per (appId, version)") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 5, 1.0), root, partitionCols = Seq("day"))
    def run(v: Long, data: org.apache.spark.sql.DataFrame) =
      ManifestTable.idempotentUpsert(spark, data, root,
        keys = Seq("day", "id"), order = "v", appId = "daily_etl", appVersion = v,
        partitionCols = Seq("day"))
    assert(run(1L, mk("d2", 5 until 10, 2.0)))
    // scheduler retry replays the same version with (possibly different!)
    // content: recognized, skipped, table unchanged
    assert(!run(1L, mk("d2", 5 until 10, 99.0)))
    assert(rows(ManifestTable.read(spark, root)).count(_._3 == 99.0) == 0)
    // older version after newer: skipped too (monotonic watermark)
    assert(run(3L, mk("d3", 10 until 12, 3.0)))
    assert(!run(2L, mk("d4", 12 until 14, 4.0)))
    // a DIFFERENT app has its own watermark
    assert(ManifestTable.idempotentUpsert(spark, mk("d5", 14 until 16, 5.0), root,
      keys = Seq("day", "id"), order = "v", appId = "other_etl", appVersion = 1L,
      partitionCols = Seq("day")))
    assert(ManifestTable.read(spark, root).count() == 14)
  }

  test("vacuumRetain: time-based retention maps to a chain-safe keep count") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 5, 1.0), root, partitionCols = Seq("day"))
    for (i <- 0 until 3)
      ManifestTable.upsertDedup(spark, mk(s"d${i + 2}", i * 5 until i * 5 + 5, 2.0),
        root, keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    // everything is seconds old: a 1-hour retention drops nothing
    assert(ManifestTable.vacuumRetain(spark, root, retainMs = 3600L * 1000) == 0)
    assert(ManifestTable.history(spark, root).count() == 4)
    // zero retention keeps the mandatory floor of one resolvable head
    ManifestTable.vacuumRetain(spark, root, retainMs = 0L)
    val left = ManifestTable.history(spark, root).select("version").collect()
      .map(_.getLong(0))
    assert(left.max == 4L, s"head must survive, got ${left.toSeq}")
    assert(ManifestTable.read(spark, root).count() == 20)
  }

  test("detail: one-row metadata summary, no data scan") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 10, 1.0).union(mk("d2", 10 until 20, 2.0)),
      root, partitionCols = Seq("day"))
    ManifestTable.addConstraint(spark, root, "v_pos", "v > 0.0")
    val d = ManifestTable.detail(spark, root).collect().head
    assert(d.getString(0) == root)
    assert(d.getLong(1) == ManifestTable.currentVersion(spark, root).get)
    val st = ManifestTable.current(spark, root).get
    assert(d.getLong(2) == st.files.size && d.getLong(3) == st.files.map(_.bytes).sum)
    assert(d.getString(5) == "day" && d.getLong(6) == 2L)
    assert(d.getString(7) == "v_pos: v > 0.0")
  }

  test("retryOnConflict: racing merge and upsert both land, nothing lost") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 20, 1.0), root, partitionCols = Seq("day"))
    // two writers race the same CAS version; the retry loop re-reads and
    // both mutations land (order-independent final state here)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fa = scala.concurrent.Future {
      ManifestTable.retryOnConflict() {
        ManifestTable.merge(spark, root, mk("d2", 20 until 25, 2.0), keys = Seq("id"))
      }
    }
    val fb = scala.concurrent.Future {
      ManifestTable.retryOnConflict() {
        ManifestTable.delete(spark, root, col("id") < 5)
      }
    }
    scala.concurrent.Await.result(fa.zip(fb), scala.concurrent.duration.Duration("120s"))
    pool.shutdown()
    assert(rows(ManifestTable.read(spark, root)) ==
      (rows(mk("d1", 5 until 20, 1.0)) ++ rows(mk("d2", 20 until 25, 2.0))))
  }

  test("CHECK constraints: gate every data path, validate live data first, droppable") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 10, 1.0), root, partitionCols = Seq("day"))
    // a constraint existing rows violate is refused outright
    intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, root, "v_big", "v > 100.0")
    }
    val vc = ManifestTable.addConstraint(spark, root, "v_pos", "v > 0.0")
    assert(ManifestTable.constraints(spark, root) == Map("v_pos" -> "v > 0.0"))
    // the metadata commit is invisible to incremental readers
    assert(ManifestTable.readChanges(spark, root, vc - 1, vc).count() == 0)

    // violating batch: refused BEFORE any write, table unchanged
    val before = ManifestTable.current(spark, root).get
    intercept[IllegalArgumentException] {
      ManifestTable.upsertDedup(spark, mk("d2", 10 until 12, -5.0), root,
        keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    }
    assert(ManifestTable.current(spark, root).get.version == before.version)
    // passing batch commits; the constraint tag carries forward
    ManifestTable.upsertDedup(spark, mk("d2", 10 until 12, 5.0), root,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    assert(ManifestTable.constraints(spark, root) == Map("v_pos" -> "v > 0.0"))

    // update and merge are gated on their RESULTS (an expression can
    // push a previously-valid row over the line)
    intercept[IllegalArgumentException] {
      ManifestTable.update(spark, root, col("id") === 0, Map("v" -> lit(-1.0)))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root, mk("d1", 0 until 1, -2.0), keys = Seq("id"),
        whenMatched = ManifestTable.MatchUpdateAll, insertUnmatched = false)
    }
    // overwrite path gated too; NULL evaluates as pass (SQL CHECK)
    intercept[IllegalArgumentException] {
      ManifestTable.write(mk("d1", 0 until 2, -1.0), root, partitionCols = Seq("day"))
    }
    ManifestTable.upsertDedup(spark,
      Seq(("d2", 99L, Option.empty[Double])).toDF("day", "id", "v"), root,
      keys = Seq("day", "id"), order = "id", partitionCols = Seq("day"))

    // reserved namespace: raw tags cannot smuggle constraints in
    intercept[IllegalArgumentException] {
      ManifestTable.upsertDedup(spark, mk("d3", 50 until 51, 1.0), root,
        keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"),
        tags = Map("constraint.evil" -> "1 = 1"))
    }
    // drop, then the previously-violating write passes
    ManifestTable.dropConstraint(spark, root, "v_pos")
    assert(ManifestTable.constraints(spark, root).isEmpty)
    ManifestTable.write(mk("d1", 0 until 2, -1.0), root, partitionCols = Seq("day"))
    assert(ManifestTable.read(spark, root).count() == 2)
  }

  test("merge: UpdateAll/Update/Delete actions, pruned rewrite, exact inserts") {
    import ManifestTable.{MatchDelete, MatchUpdate, MatchUpdateAll}
    val root = tmp() + "/t"
    ManifestTable.write(
      mk("d1", 0 until 50, 1.0).union(mk("d2", 50 until 100, 2.0)),
      root, partitionCols = Seq("day"))
    val before = ManifestTable.current(spark, root).get
    val d1Paths = before.files.filter(_.partitionPath == "day=d1").map(_.relPath).toSet

    // UpdateAll + insert: touches only d2 (source keys live there) + new d3
    val src = mk("d2", 90 until 110, 9.0) // 90..99 match, 100..109 insert
      .withColumn("day", when(col("id") >= 100, "d3").otherwise(col("day")))
    val v2 = ManifestTable.merge(spark, root, src, keys = Seq("id"))
    assert(v2 == before.version + 1)
    val after = ManifestTable.current(spark, root).get
    assert(d1Paths.subsetOf(after.files.map(_.relPath).toSet),
      "d1 files cannot match any source key and must be carried by reference")
    val now = rows(ManifestTable.read(spark, root))
    assert(now == (rows(mk("d1", 0 until 50, 1.0)) ++ rows(mk("d2", 50 until 90, 2.0)) ++
      rows(mk("d2", 90 until 100, 9.0)) ++ rows(mk("d3", 100 until 110, 9.0))))

    // MatchUpdate mixing old-target and source values (_src_ prefix)
    ManifestTable.merge(spark, root,
      mk("d1", 0 until 5, 100.0), keys = Seq("id"),
      whenMatched = MatchUpdate(Map("v" -> (col("v") + col("_src_v")))),
      insertUnmatched = false)
    val d1v = ManifestTable.read(spark, root).filter(col("id") < 6)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(d1v(0L) == 101.0 && d1v(5L) == 1.0)

    // MatchDelete removes matched rows only
    ManifestTable.merge(spark, root, mk("d3", 100 until 105, 0.0),
      keys = Seq("id"), whenMatched = MatchDelete, insertUnmatched = false)
    assert(ManifestTable.read(spark, root).filter(col("day") === "d3").count() == 5)

    // duplicate source keys refuse loudly
    intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root,
        mk("d1", 0 until 2, 1.0).union(mk("d1", 0 until 1, 2.0)), keys = Seq("id"))
    }
    // history records the op
    assert(ManifestTable.history(spark, root).select("op").collect()
      .map(_.getString(0)).count(_ == "merge") == 3)
    assert(ManifestTable.merge(spark, root, mk("dX", 5000 until 5001, 1.0),
      keys = Seq("id"), whenMatched = MatchUpdateAll).toString.nonEmpty) // insert-only path runs
    assert(ManifestTable.read(spark, root).filter(col("day") === "dX").count() == 1)
  }

  test("delete/update: copy-on-write rewrites only files that might match") {
    val root = tmp() + "/t"
    ManifestTable.write(
      mk("d1", 0 until 100, 1.0).union(mk("d2", 100 until 200, 2.0))
        .union(mk("d3", 200 until 300, 3.0)),
      root, partitionCols = Seq("day"))
    val before = ManifestTable.current(spark, root).get
    val untouchedPaths = before.files.filterNot(_.partitionPath == "day=d2")
      .map(_.relPath).toSet

    // DELETE rows of d2 with id < 150: only d2's files rewritten
    val v2 = ManifestTable.delete(spark, root, col("day") === "d2" && col("id") < 150)
    val after = ManifestTable.current(spark, root).get
    assert(untouchedPaths.subsetOf(after.files.map(_.relPath).toSet),
      "files that cannot match must be carried by reference")
    assert(rows(ManifestTable.read(spark, root)) ==
      (rows(mk("d1", 0 until 100, 1.0)) ++ rows(mk("d2", 150 until 200, 2.0)) ++
        rows(mk("d3", 200 until 300, 3.0))))
    // provably-no-match predicate: version unchanged, nothing rewritten
    assert(ManifestTable.delete(spark, root, col("day") === "zzz") == v2)
    // NULL-predicate rows are KEPT (SQL DELETE semantics)
    val rootN = tmp() + "/tn"
    ManifestTable.write(Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v"), rootN)
    ManifestTable.delete(spark, rootN, col("v") > 2.0)
    assert(ManifestTable.read(spark, rootN).select("id").as[Long].collect().toSeq.sorted
      == Seq(1L, 2L))

    // UPDATE: expression sees the OLD row; non-matching rows untouched
    ManifestTable.update(spark, root, col("day") === "d3" && col("id") < 210,
      Map("v" -> (col("v") * 10 + col("id"))))
    val d3 = ManifestTable.read(spark, root).filter(col("day") === "d3")
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(d3(205L) == 3.0 * 10 + 205 && d3(250L) == 3.0)
    // update of an unknown column fails before any write
    intercept[IllegalArgumentException] {
      ManifestTable.update(spark, root, col("id") === 1, Map("nope" -> lit(1)))
    }
    // both ops are data-changing in the change feed (adds re-emit)
    val h = ManifestTable.history(spark, root).select("version", "op").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h(v2) == "delete" && h(v2 + 1) == "update")
  }

  test("compactSmallFiles rewrites only the debt; big files carried; history records ops") {
    val root = tmp() + "/t"
    // one genuinely-big d1 generation (high-entropy padding pushes its
    // files past the 1 MB debt threshold) + several tiny d2 micro-upserts
    // d1 is heavy (high-entropy padding, ~2.5 MB per task file), d2 is 20
    // tiny rows; written through 6 round-robin tasks, each partition dir
    // gets 6 files — d1's all >= 1 MB (not debt), d2's all tiny (the
    // streaming-sink residue shape compaction exists for)
    val data = spark.range(60000).select(lit("d1").as("day"), col("id"),
        col("id").cast("double").as("v"),
        concat((0 until 4).map(i => md5(concat(col("id").cast("string"), lit(i)))): _*).as("pad"))
      .union(mk("d2", 60000 until 60020, 2.0).withColumn("pad", lit("x")))
      .repartition(6)
    // fragmentation IS the fixture: opt out of the optimized-write
    // default (r19: partitioned write() seeds rebalance-shaped commits,
    // which would coalesce each day to one file and leave compaction
    // no small-file debt to find)
    ManifestTable.createEmpty(spark, root, data.schema,
      partitionCols = Seq("day"),
      tags = Map(ManifestTable.OptimizedWriteProp -> "false"))
    ManifestTable.write(data, root, partitionCols = Seq("day"))
    // plus one micro-upsert so history shows a delta commit too
    ManifestTable.upsertDedup(spark,
      mk("d3", 70000 until 70005, 3.0).withColumn("pad", lit("y")),
      root, keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    val before = ManifestTable.current(spark, root).get
    val bigPaths = before.files.filter(_.bytes >= 1024 * 1024).map(_.relPath).toSet
    assert(bigPaths.nonEmpty, s"need >=1MB files, sizes=${before.files.map(_.bytes)}")
    val countBefore = ManifestTable.read(spark, root).count()
    val vc = ManifestTable.compactSmallFiles(spark, root,
      smallFileMB = 1, targetFileMB = 64, minFiles = 2)
    val after = ManifestTable.current(spark, root).get
    assert(vc == before.version + 1 && after.files.size < before.files.size)
    // the big files are carried BY REFERENCE — identical paths survive
    assert(bigPaths.subsetOf(after.files.map(_.relPath).toSet))
    assert(ManifestTable.read(spark, root).count() == countBefore)
    // incremental readers see NOTHING from the rewrite
    assert(ManifestTable.readChanges(spark, root, before.version, vc).count() == 0)
    // below minFiles → no-op commit
    assert(ManifestTable.compactSmallFiles(spark, root, smallFileMB = 1,
      minFiles = 1000) == vc)
    // history: newest first, ops recorded, delta commits show removes
    val h = ManifestTable.history(spark, root)
      .select("version", "op", "kind").collect()
    assert(h.head.getLong(0) == vc && h.head.getString(1) == "rewrite")
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).toSeq.sorted.reverse)
    assert(h.exists(r => r.getString(1) == "upsert" && r.getString(2) == "delta"))
  }

  test("readChangesWhere prunes changed files by predicate, same rows as filter") {
    val root = tmp() + "/t"
    ManifestTable.write(mk("d1", 0 until 10, 1.0), root, partitionCols = Seq("day"))
    val v1 = ManifestTable.currentVersion(spark, root).get
    // one upsert touching TWO partitions; the filtered incremental read
    // must scan only the matching partition's changed files
    ManifestTable.upsertDedup(spark,
      mk("d2", 10 until 20, 2.0).union(mk("d3", 20 until 30, 3.0)), root,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    val v2 = ManifestTable.currentVersion(spark, root).get
    val all = ManifestTable.readChanges(spark, root, v1, v2)
    val sliced = ManifestTable.readChangesWhere(spark, root, v1, v2, col("day") === "d3")
    assert(sliced.inputFiles.length < all.inputFiles.length)
    assert(rows(sliced) == rows(all.filter(col("day") === "d3")))
    // empty slice: schema-preserving zero-row frame, no scan
    val none = ManifestTable.readChangesWhere(spark, root, v1, v2, col("day") === "nope")
    assert(none.count() == 0 && none.schema == all.schema)
  }

  test("consumeChanges: exactly-once incremental relay with aggregation, idempotent replays") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    ManifestTable.write(mk("d1", 0 until 10, 2.0), src, partitionCols = Seq("day"))

    def hop(): Option[Long] =
      ManifestTable.consumeChanges(spark, src, dst, "daily", keys = Seq("day"),
        order = "total", partitionCols = Nil) { changes =>
        changes.groupBy("day").agg(sum("v").as("total"), count(lit(1)).as("n"))
      }

    assert(hop().contains(1L))
    def dstRows() = ManifestTable.read(spark, dst)
      .select("day", "total", "n").as[(String, Double, Long)].collect().toSet
    assert(dstRows() == Set(("d1", 20.0, 10L)))
    // nothing new → no-op, no watermark movement, no duplicate apply
    assert(hop().isEmpty)
    assert(dstRows() == Set(("d1", 20.0, 10L)))

    // new partition + a d1 re-upsert: the d1 partition re-emits its full
    // merged content, and the keyed upsert REPLACES the stale d1 rollup —
    // at-least-once file granularity, exactly-once table effect
    ManifestTable.upsertDedup(spark, mk("d1", 10 until 15, 4.0).union(mk("d2", 0 until 5, 1.0)),
      src, keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    assert(hop().contains(2L))
    assert(dstRows() == Set(("d1", 40.0, 15L), ("d2", 5.0, 5L)))

    // a replay of the same source version (simulated restart that lost
    // nothing) is recognized by the per-consumer watermark
    assert(hop().isEmpty)
    assert(dstRows() == Set(("d1", 40.0, 15L), ("d2", 5.0, 5L)))
  }

  test("consumeChanges chains: minute→hourly→daily cascade, each hop incremental") {
    // the reference's multi-resolution cadence (12→13→14_binance_*.py)
    // as lakehouse hops: each layer consumes only its upstream's changes
    val minute = tmp() + "/minute"
    val hourly = tmp() + "/hourly"
    val daily = tmp() + "/daily"
    // "minute" rows: (day, id, v); hourly = per-day sum; daily = global count of days
    def hopHourly() = ManifestTable.consumeChanges(spark, minute, hourly, "h",
      keys = Seq("day"), order = "total") { ch =>
      ch.groupBy("day").agg(sum("v").as("total"))
    }
    def hopDaily() = ManifestTable.consumeChanges(spark, hourly, daily, "d",
      keys = Seq("grain"), order = "days") { ch =>
      // hourly changes re-emit merged content; recompute the downstream
      // key's aggregate from the DOWNSTREAM's own upstream snapshot
      // would re-scan — instead this layer's key is coarse enough that
      // the changed rows alone carry it (count of changed days is a
      // demo aggregate; keyed upsert keeps it idempotent)
      ch.agg(count(lit(1)).as("days")).withColumn("grain", lit("all"))
    }
    ManifestTable.write(mk("d1", 0 until 4, 1.0), minute, partitionCols = Seq("day"))
    assert(hopHourly().contains(1L))
    assert(hopDaily().contains(1L))
    assert(ManifestTable.read(spark, daily).select("days").as[Long].collect().toSeq == Seq(1L))
    // second minute batch: only d2 flows through both hops
    ManifestTable.upsertDedup(spark, mk("d2", 4 until 10, 2.0), minute,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    assert(hopHourly().contains(2L))
    val hourlyRows = ManifestTable.read(spark, hourly)
      .select("day", "total").as[(String, Double)].collect().toSet
    assert(hourlyRows == Set(("d1", 4.0), ("d2", 12.0)))
    assert(hopDaily().contains(2L))
    // idle cascade: both hops are no-ops
    assert(hopHourly().isEmpty && hopDaily().isEmpty)
  }

  test("streaming source admission control: bounded catch-up batches + AvailableNow drain") {
    val src = tmp() + "/src"
    ManifestTable.write(mk("d1", 0 until 3, 1.0), src, partitionCols = Seq("day"))
    ManifestTable.upsertDedup(spark, mk("d2", 3 until 6, 2.0), src,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    ManifestTable.upsertDedup(spark, mk("d3", 6 until 9, 3.0), src,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    // a stream starting from scratch with maxversionsperbatch=1 folds
    // ONE commit per micro-batch instead of one table-sized batch
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[String]]()
    val q = spark.readStream.format("graft.sources.ManifestChangesSourceProvider")
      .option("path", src).option("maxversionsperbatch", 1).load()
      .writeStream.option("checkpointLocation", tmp() + "/ck")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.select("day").distinct().collect().map(_.getString(0)).toSet); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    assert(!q.isActive, "AvailableNow must terminate after draining")
    val got = scala.jdk.CollectionConverters.CollectionHasAsScala(batches).asScala.toSeq
    assert(got == Seq(Set("d1"), Set("d2"), Set("d3")),
      s"expected one commit per batch, got $got")
  }

  test("streaming source → streamUpsertSink: incremental, restart-safe, no duplicates") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    val ckpt = tmp() + "/ckpt"
    ManifestTable.write(mk("d1", 0 until 10, 1.0), src, partitionCols = Seq("day"))

    def startHop() = ManifestTable.streamUpsertSink(
      spark.readStream.format("graft.sources.ManifestChangesSourceProvider")
        .option("path", src).load()
        .withColumn("v", col("v") * 10),
      dst, ckpt, keys = Seq("day", "id"), order = "v", sinkId = "hop1")

    val q1 = startHop()
    try q1.processAllAvailable() finally q1.stop()
    def dstRows() = rows(ManifestTable.read(spark, dst))
    assert(dstRows() == mk("d1", 0 until 10, 10.0).as[(String, Long, Double)].collect().toSet)

    // commits while the stream is DOWN are picked up on restart from the
    // same checkpoint — and replayed batches are skipped by the sink's
    // per-sink watermark, so restart cannot double-apply
    ManifestTable.upsertDedup(spark, mk("d2", 10 until 14, 2.0), src,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    val q2 = startHop()
    try q2.processAllAvailable() finally q2.stop()
    assert(dstRows() ==
      (mk("d1", 0 until 10, 10.0).as[(String, Long, Double)].collect().toSet ++
        mk("d2", 10 until 14, 20.0).as[(String, Long, Double)].collect().toSet))

    // compact + z-order cluster while the stream is live: rewrites are
    // invisible to the feed — no batch reaches the sink, nothing changes
    val beforeRewrite = dstRows()
    ManifestTable.compact(spark, src, targetFileMB = 16)
    ManifestTable.cluster(spark, src, Seq("id"), targetFileMB = 16, zOrder = true)
    val q2b = startHop()
    try q2b.processAllAvailable() finally q2b.stop()
    assert(dstRows() == beforeRewrite,
      "a compaction/clustering rewrite must not re-emit the table downstream")

    // startingversion=latest subscribes to NEW commits only
    val late = spark.readStream.format("graft.sources.ManifestChangesSourceProvider")
      .option("path", src).option("startingversion", "latest").load()
    val q3 = late.writeStream.format("memory").queryName("late_changes")
      .option("checkpointLocation", tmp() + "/ckpt3").start()
    try {
      q3.processAllAvailable()
      assert(spark.table("late_changes").count() == 0)
      ManifestTable.upsertDedup(spark, mk("d3", 0 until 3, 5.0), src,
        keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
      q3.processAllAvailable()
      assert(spark.table("late_changes").select("day").distinct()
        .as[String].collect().toSeq == Seq("d3"))
    } finally q3.stop()
  }

  test("persistent IVF index: consumeChanges-maintained, probes read only the probed cells") {
    import graft.operators.Ann
    val corpus = tmp() + "/vecs"
    val index = tmp() + "/ivf_index"
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding")
    val first = emb.filter(col("vec_id") < 250)
    ManifestTable.write(first, corpus)
    val centroids = Ann.trainCentroids(first, "embedding", k = 8)

    def hop(): Option[Long] =
      ManifestTable.consumeChanges(spark, corpus, index, "ivfidx",
        keys = Seq("vec_id"), order = "vec_id",
        partitionCols = Seq("cell_id")) { ch =>
        Ann.ivfIndexRows(ch, "vec_id", "embedding", centroids)
      }
    assert(hop().nonEmpty)

    val queries = emb.filter(col("vec_id").isin(3L, 77L))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet

    // parity: the index probe equals from-scratch IVF over the same
    // vectors and centroids
    val viaIndex = Ann.ivfProbeIndex(spark, index, "vec_id", "embedding",
      centroids, queries, k = 5, nProbe = 3)
    assert(asSet(viaIndex) ==
      asSet(Ann.ivfTopK(first, "vec_id", "embedding", centroids, queries, k = 5, nProbe = 3)))

    // the probe scanned only the probed cells' partition files
    val totalFiles = ManifestTable.read(spark, index).inputFiles.length
    assert(viaIndex.inputFiles.length < totalFiles,
      s"probe scanned ${viaIndex.inputFiles.length}/$totalFiles index files")

    // second half of the corpus arrives: one incremental hop, same parity
    ManifestTable.upsertDedup(spark, emb.filter(col("vec_id") >= 250), corpus,
      keys = Seq("vec_id"), order = "vec_id")
    assert(hop().nonEmpty)
    assert(asSet(Ann.ivfProbeIndex(spark, index, "vec_id", "embedding",
        centroids, queries, k = 5, nProbe = 3)) ==
      asSet(Ann.ivfTopK(emb, "vec_id", "embedding", centroids, queries, k = 5, nProbe = 3)))
  }

  test("consumeChanges advances its watermark across rewrite-only / empty windows") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    ManifestTable.write(mk("d1", 0 until 10, 2.0), src, partitionCols = Seq("day"))

    var transformRuns = 0
    def hop(): Option[Long] =
      ManifestTable.consumeChanges(spark, src, dst, "daily", keys = Seq("day"),
        order = "total", partitionCols = Nil) { changes =>
        transformRuns += 1
        changes.groupBy("day").agg(sum("v").as("total"))
      }
    def watermark(): Option[String] =
      ManifestTable.current(spark, dst).flatMap(_.tags.get("stream_batch.consume.daily"))

    assert(hop().contains(1L))
    assert(watermark().contains("1"))

    // rewrite-only window: nothing to consume, but the watermark must
    // advance via a tags-only commit so the next call does not re-walk
    // (and re-transform) the same empty window
    val v2 = ManifestTable.compact(spark, src, targetFileMB = 1)
    assert(v2 == 2L)
    val runsBefore = transformRuns
    assert(hop().isEmpty)
    assert(transformRuns == runsBefore + 1) // this call walked the window...
    assert(watermark().contains("2"), "empty window must advance the watermark")
    assert(hop().isEmpty)
    assert(transformRuns == runsBefore + 1, "...but the next call must NOT")

    // destination data unaffected by the meta commits; later real data flows
    ManifestTable.upsertDedup(spark, mk("d2", 0 until 5, 1.0), src,
      keys = Seq("day", "id"), order = "v", partitionCols = Seq("day"))
    assert(hop().contains(3L))
    assert(watermark().contains("3"))
    assert(ManifestTable.read(spark, dst).select("day", "total")
      .as[(String, Double)].collect().toSet == Set(("d1", 20.0), ("d2", 5.0)))
  }
}
