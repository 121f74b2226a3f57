package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{Identifier, SupportsWrite}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: CommitLog tables through a DSv2 TableCatalog —
  * pure-SQL create/insert/select, VERSION/TIMESTAMP AS OF time travel,
  * commit-stats file pruning visible in the physical plan, reader-side
  * schema evolution, and the loud vacuumed-version contract. */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    dir
  }

  test("pure-SQL lifecycle: CTAS commits, INSERT appends, VERSION AS OF and TIMESTAMP AS OF time-travel, INSERT OVERWRITE truncates") {
    val root = s"$wh/db/li"
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity").cast("long").as("q"))
      .createOrReplaceTempView("li_src")
    val n = spark.table("li_src").count()

    spark.sql("CREATE TABLE gcat.db.li AS SELECT * FROM li_src")
    assert(spark.sql("SELECT count(*) FROM gcat.db.li").head().getLong(0) == n)
    // v1 = the zero-row create commit, v2 = the CTAS append
    assert(CommitLog.headVersion(spark, root) == 2L)
    assert(spark.sql("SELECT * FROM gcat.db.li VERSION AS OF 1").count() == 0L)

    Thread.sleep(120) // commit-mtime ms must separate v2 from v3
    spark.sql("INSERT INTO gcat.db.li SELECT k, q FROM li_src LIMIT 10")
    assert(spark.sql("SELECT count(*) FROM gcat.db.li").head().getLong(0) == n + 10)
    assert(spark.sql("SELECT count(*) FROM gcat.db.li VERSION AS OF 2")
      .head().getLong(0) == n)
    // history carries the ops the SQL statements landed as
    val ops = CommitLog.history(spark, root).orderBy("version")
      .collect().map(_.getAs[String]("op")).toSeq
    assert(ops == Seq("create", "append", "append"), ops.toString)

    // timestamp travel: the instant v2 landed (commit-file mtime, the
    // same clock versionAsOfTime resolves) reads the v2 snapshot
    val t2 = CommitLog.history(spark, root)
      .filter(col("version") === 2L && col("op") === "append")
      .select(date_format(col("commit_ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .head().getString(0)
    assert(spark.sql(s"SELECT count(*) FROM gcat.db.li TIMESTAMP AS OF '$t2'")
      .head().getLong(0) == n)

    Thread.sleep(120)
    // static mode explicitly: a concurrently-running suite could leak
    // dynamic partitionOverwriteMode into the shared session, which
    // re-plans INSERT OVERWRITE as the dynamic-partition form graft
    // tables decline (see the GraftCatalog scaladoc note)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    spark.sql("INSERT OVERWRITE gcat.db.li SELECT k, q FROM li_src LIMIT 5")
    assert(spark.sql("SELECT count(*) FROM gcat.db.li").head().getLong(0) == 5L)
    assert(spark.sql("SELECT count(*) FROM gcat.db.li VERSION AS OF 2")
      .head().getLong(0) == n)
    // the overwrite is one commit with op tag through the same protocol
    assert(CommitLog.history(spark, root)
      .filter(col("version") === 4L).head().getAs[String]("op") == "overwrite")
  }

  test("plan shape: commit-stats prune files at planning time, filters reach the parquet scan, columns prune") {
    spark.sql("CREATE TABLE gcat.db.pr (k BIGINT, grp BIGINT, v BIGINT)")
    spark.conf.set("graft.catalog.statsColumns", "k")
    try {
      import spark.implicits._
      // two disjoint-key commits: stats admit exactly one for a point read
      (0L until 100L).map(i => (i, i % 7, i * 2)).toDF("k", "grp", "v")
        .createOrReplaceTempView("pr_lo")
      (100L until 200L).map(i => (i, i % 7, i * 2)).toDF("k", "grp", "v")
        .createOrReplaceTempView("pr_hi")
      spark.sql("INSERT INTO gcat.db.pr SELECT * FROM pr_lo")
      spark.sql("INSERT INTO gcat.db.pr SELECT * FROM pr_hi")
    } finally spark.conf.unset("graft.catalog.statsColumns")

    val q = spark.sql("SELECT k, v FROM gcat.db.pr WHERE k >= 150")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      (150L until 200L).map(i => (i, i * 2)))
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan }.get.asInstanceOf[ParquetScan]
    val live = CommitLog.liveFiles(spark, s"$wh/db/pr")
    // file-level skip: only the hi commit's files survive planning (the
    // stat-less zero-row create file is kept — the superset rule)
    assert(scan.fileIndex.inputFiles.length < live.size,
      s"${scan.fileIndex.inputFiles.length} of ${live.size} files read")
    assert(scan.fileIndex.inputFiles.forall(f =>
      !f.contains(dirHoldingKey(spark, s"$wh/db/pr", 0L))))
    // the comparison reached the parquet scan for row-group skipping
    assert(scan.pushedFilters.mkString(",").contains("GreaterThanOrEqual(k,150)"),
      scan.pushedFilters.mkString(","))
    // column pruning: grp never read
    assert(scan.readDataSchema.fieldNames.toSet == Set("k", "v"),
      scan.readDataSchema.simpleString)

    // out-of-bounds read against gcat.db.pr still touches the STAT-LESS
    // zero-row create file (the superset rule: no stat ⇒ unskippable),
    // but nothing else
    val oob = spark.sql("SELECT k FROM gcat.db.pr WHERE k > 5000")
    assert(oob.count() == 0L)
    val oobScan = oob.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan }.get.asInstanceOf[ParquetScan]
    assert(oobScan.fileIndex.inputFiles.length == 1,
      oobScan.fileIndex.inputFiles.mkString(","))

    // on a table where EVERY live file carries stats (API-built, no
    // create file), excluding bounds plan a zero-partition scan
    import spark.implicits._
    val allStats = s"$wh/db/prs"
    CommitLog.append((0L until 50L).toDF("k"), allStats, None, Seq("k"))
    val none = spark.sql("SELECT k FROM gcat.db.prs WHERE k > 5000")
    assert(none.count() == 0L)
    assert(none.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan }.get.isInstanceOf[graft.sources.GraftEmptyScan])
  }

  /** The data dir (d-<uuid>) holding the given key, via the stats. */
  private def dirHoldingKey(s: org.apache.spark.sql.SparkSession,
      root: String, key: Long): String = {
    val st = CommitLog.statFold(CommitLog.log(s, root), "k").values
      .find(st => st.min <= key && key <= st.max).get
    st.file.takeWhile(_ != '/')
  }

  test("reader-side schema evolution through SQL: added column null-fills, int widens to long; time travel reads the old schema") {
    val root = s"$wh/db/evo"
    import spark.implicits._
    CommitLog.append(Seq((1, 10)).toDF("k", "v"), root)           // int, int
    CommitLog.append(Seq((2L, 20L, "x")).toDF("k", "v", "tag"), root) // widened + added
    val head = spark.sql("SELECT * FROM gcat.db.evo ORDER BY k")
    assert(head.schema.simpleString ==
      "struct<k:bigint,v:bigint,tag:string>", head.schema.simpleString)
    assert(head.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getString(2)))).toSeq ==
      Seq((1L, 10L, None), (2L, 20L, Some("x"))))
    // the pre-evolution version reads with its own (old) schema
    val v1 = spark.sql("SELECT * FROM gcat.db.evo VERSION AS OF 1")
    assert(v1.schema.simpleString == "struct<k:int,v:int>", v1.schema.simpleString)
    assert(v1.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10)))
  }

  test("vacuumed version fails LOUD at load with the retention contract; nonexistent versions and tables error") {
    val root = s"$wh/db/vac"
    import spark.implicits._
    CommitLog.append(Seq((1L, "a")).toDF("k", "s"), root)
    CommitLog.overwrite(Seq((2L, "b")).toDF("k", "s"), root)
    CommitLog.vacuum(spark, root) // v1's files are gone; v1 still in the log
    assert(spark.sql("SELECT k FROM gcat.db.vac").head().getLong(0) == 2L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.vac VERSION AS OF 1").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("reclaimed by vacuum") &&
      t.getMessage.contains("retainLast")), chain(e).map(_.getMessage))
    // version beyond head errors with the head named
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.vac VERSION AS OF 99").collect()
    }
    assert(chain(e2).exists(t => t.getMessage != null &&
      t.getMessage.contains("version 99 does not exist")))
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.no_such_table").collect()
    }
  }

  test("DELETE FROM: keyed predicates land as one delta-sized delete version; WHERE-less truncates; unsupported shapes decline loudly") {
    import spark.implicits._
    val root = s"$wh/db/del"
    CommitLog.append((1L to 100L).map(k => (k, s"row$k")).toDF("k", "s"),
      root, None, Seq("k"))
    CommitLog.append((101L to 200L).map(k => (k, s"row$k")).toDF("k", "s"),
      root, None, Seq("k"))
    val preVersion = CommitLog.headVersion(spark, root)
    val preFiles = CommitLog.liveFiles(spark, root).toSet

    spark.sql("DELETE FROM gcat.db.del WHERE k IN (5, 7) OR k = 5")
    // ^ OR of same-key predicates translates to In(k, [5,7]); verify state
    assert(spark.sql("SELECT count(*) FROM gcat.db.del").head().getLong(0) == 198L)
    assert(spark.sql("SELECT count(*) FROM gcat.db.del WHERE k IN (5, 7)")
      .head().getLong(0) == 0L)
    // ONE delete version; the second commit's files (k 101..200, disjoint
    // from the deleted keys by stats) keep their identity
    assert(CommitLog.headVersion(spark, root) == preVersion + 1)
    assert(CommitLog.history(spark, root)
      .orderBy(col("version").desc).head().getAs[String]("op") == "delete")
    val post = CommitLog.liveFiles(spark, root).toSet
    val hiFiles = preFiles.filter { f =>
      CommitLog.statFold(CommitLog.log(spark, root), "k")
        .get(f).exists(_.min >= 101L) }
    assert(hiFiles.nonEmpty && hiFiles.subsetOf(post),
      "files disjoint from the deleted keys must keep identity")
    // time travel still serves the pre-delete snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM gcat.db.del VERSION AS OF $preVersion")
      .head().getLong(0) == 200L)

    // unsupported shape: a range predicate is declined, not half-applied
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gcat.db.del WHERE k > 150")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      (t.getMessage.contains("DELETE") || t.getMessage.contains("delete"))),
      chain(e).map(_.getMessage))
    assert(spark.sql("SELECT count(*) FROM gcat.db.del").head().getLong(0) == 198L)

    // WHERE-less delete = truncate as one zero-row overwrite commit;
    // schema survives (the create-file mechanism), history shows it
    spark.sql("DELETE FROM gcat.db.del")
    assert(spark.sql("SELECT count(*) FROM gcat.db.del").head().getLong(0) == 0L)
    assert(spark.sql("SELECT * FROM gcat.db.del").schema.fieldNames.toSeq ==
      Seq("k", "s"))
    assert(CommitLog.history(spark, root)
      .orderBy(col("version").desc).head().getAs[String]("op") == "overwrite")
  }

  test("MERGE INTO: the keyed upsert lands as one delta-sized merge version; token replays no-op; unsupported shapes decline loudly") {
    import spark.implicits._
    val root = s"$wh/db/mrg"
    CommitLog.append((1L to 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, None, Seq("k"))
    CommitLog.append((101L to 200L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, None, Seq("k"))
    val preVersion = CommitLog.headVersion(spark, root)
    val preFiles = CommitLog.liveFiles(spark, root).toSet
    Seq((5L, "UP5"), (7L, "UP7"), (201L, "NEW201")).toDF("k", "s")
      .createOrReplaceTempView("mrg_src")

    spark.sql("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    // matched rows replaced, unmatched inserted, the rest intact
    assert(spark.sql("SELECT count(*) FROM gcat.db.mrg").head().getLong(0) == 201L)
    assert(spark.sql("SELECT s FROM gcat.db.mrg WHERE k = 5").head().getString(0) == "UP5")
    assert(spark.sql("SELECT s FROM gcat.db.mrg WHERE k = 201").head().getString(0) == "NEW201")
    assert(spark.sql("SELECT s FROM gcat.db.mrg WHERE k = 6").head().getString(0) == "v6")
    // ONE merge version; the second append's files (k 101..200, disjoint
    // from every updated key by stats) keep their identity — delta-sized
    assert(CommitLog.headVersion(spark, root) == preVersion + 1)
    assert(CommitLog.history(spark, root)
      .orderBy(col("version").desc).head().getAs[String]("op") == "merge")
    val post = CommitLog.liveFiles(spark, root).toSet
    val hiFiles = preFiles.filter { f =>
      CommitLog.statFold(CommitLog.log(spark, root), "k")
        .get(f).exists(_.min >= 101L) }
    assert(hiFiles.nonEmpty && hiFiles.subsetOf(post),
      "files disjoint from the merged keys must keep identity")
    // time travel still serves the pre-merge snapshot
    assert(spark.sql(
      s"SELECT s FROM gcat.db.mrg VERSION AS OF $preVersion WHERE k = 5")
      .head().getString(0) == "v5")

    // exactly-once: a replayed token no-ops (same statement, token set)
    spark.conf.set("graft.catalog.txnId", "mrg-tok-1")
    try {
      spark.sql("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
      val vTok = CommitLog.headVersion(spark, root)
      val replay = spark.sql(
        """MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
      assert(CommitLog.headVersion(spark, root) == vTok,
        "a replayed txn token must not commit a second version")
      assert(replay.head.getLong(0) == -1L, "replay reports no version")
      assert(spark.sql("SELECT count(*) FROM gcat.db.mrg").head().getLong(0) == 201L)
    } finally spark.conf.unset("graft.catalog.txnId")

    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    def declined(sql: String, marker: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains(marker)), chain(e).map(_.getMessage))
    }
    // cardinality rule: duplicate source keys fail loudly at run time
    Seq((5L, "A"), (5L, "B")).toDF("k", "s").createOrReplaceTempView("mrg_dup")
    declined("""MERGE INTO gcat.db.mrg t USING mrg_dup s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""", "one row per key")
    // WHEN MATCHED THEN DELETE (sole clause) = the keyed CDC retraction:
    // one delta-sized delete version, unmatched keys delete nothing
    Seq(6L, 7L, 99999L).toDF("k").createOrReplaceTempView("mrg_del")
    val preDel = CommitLog.headVersion(spark, root)
    val dv = spark.sql(
      """MERGE INTO gcat.db.mrg t USING mrg_del s ON t.k = s.k
         WHEN MATCHED THEN DELETE""").head().getLong(0)
    assert(dv == preDel + 1)
    assert(CommitLog.history(spark, root)
      .orderBy(col("version").desc).head().getAs[String]("op") == "delete")
    assert(spark.sql("SELECT count(*) FROM gcat.db.mrg WHERE k IN (6, 7)")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM gcat.db.mrg").head().getLong(0) == 199L)
    // replayed delete token no-ops
    spark.conf.set("graft.catalog.txnId", "mrg-del-tok")
    try {
      Seq(8L).toDF("k").createOrReplaceTempView("mrg_del2")
      spark.sql("""MERGE INTO gcat.db.mrg t USING mrg_del2 s ON t.k = s.k
                   WHEN MATCHED THEN DELETE""")
      val vTok = CommitLog.headVersion(spark, root)
      val replay = spark.sql(
        """MERGE INTO gcat.db.mrg t USING mrg_del2 s ON t.k = s.k
           WHEN MATCHED THEN DELETE""").head().getLong(0)
      assert(CommitLog.headVersion(spark, root) == vTok && replay == -1L)
      assert(spark.sql("SELECT count(*) FROM gcat.db.mrg").head().getLong(0) == 198L)
    } finally spark.conf.unset("graft.catalog.txnId")
    // a delete MIXED with an upsert clause cannot land as one commit
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                WHEN MATCHED THEN DELETE
                WHEN NOT MATCHED THEN INSERT *""", "cannot land as one commit")
    // shape guardrails, declined at analysis with the contract named
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                WHEN MATCHED AND s.k > 5 THEN DELETE""", "conditional WHEN MATCHED DELETE")
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET s = s.s
                WHEN NOT MATCHED THEN INSERT *""", "UPDATE SET must cover every target column")
    // (ON t.s = s.s is a legal STRING-keyed merge and a conjunction of
    // key equalities is a legal COMPOSITE merge since r19 — each covered
    // by its own test; a non-equality conjunct is still not a keyed shape)
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k AND t.k > 0
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""", "keyed upsert")
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                WHEN MATCHED AND s.k > 5 THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""", "conditional WHEN MATCHED")
    declined("""MERGE INTO gcat.db.mrg t USING mrg_src s ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *
                WHEN NOT MATCHED BY SOURCE THEN DELETE""", "NOT MATCHED BY SOURCE")
    // no declined shape mutated the table (198 = 201 − the 3 MERGE-deleted)
    assert(spark.sql("SELECT count(*) FROM gcat.db.mrg").head().getLong(0) == 198L)
  }

  test("string-keyed CDC from SQL (r19): MERGE INTO on a doc_id lands delta-sized with bloom probe pruning; DELETE FROM takes string keys") {
    import spark.implicits._
    val root = s"$wh/db/sdocs"
    // three single-file versions, each merge landing doc_id blooms
    def docs(lo: Int, hi: Int) =
      (lo to hi).map(i => (f"doc-$i%04d", s"body$i")).toDF("doc_id", "body")
    spark.sql("CREATE TABLE gcat.db.sdocs (doc_id STRING, body STRING)")
    CommitLog.merge(docs(1, 10).coalesce(1), root, "doc_id")
    CommitLog.merge(docs(11, 20).coalesce(1), root, "doc_id")
    val before = CommitLog.liveFiles(spark, root)

    // SQL MERGE keyed on the STRING doc_id: one delta-sized version
    Seq(("doc-0012", "UPDATED"), ("doc-0099", "NEW"))
      .toDF("doc_id", "body").createOrReplaceTempView("sdocs_cdc")
    val v = spark.sql(
      """MERGE INTO gcat.db.sdocs t USING sdocs_cdc s ON t.doc_id = s.doc_id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").head().getLong(0)
    assert(v == CommitLog.headVersion(spark, root))
    // only the file HOLDING doc-0012 was rewritten (probe pruning held)
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) ==
      before.toSet.filterNot(_ == before.last),
      s"expected only ${before.last} rewritten; before=$before after=$after")
    assert(spark.sql(
      "SELECT body FROM gcat.db.sdocs WHERE doc_id = 'doc-0012'")
      .head().getString(0) == "UPDATED")
    assert(spark.sql("SELECT count(*) FROM gcat.db.sdocs").head().getLong(0) == 21L)

    // SQL MERGE retraction on string keys
    Seq("doc-0001", "doc-no-such").toDF("doc_id")
      .createOrReplaceTempView("sdocs_del")
    spark.sql("""MERGE INTO gcat.db.sdocs t USING sdocs_del s
                 ON t.doc_id = s.doc_id WHEN MATCHED THEN DELETE""").collect()
    assert(spark.sql("SELECT count(*) FROM gcat.db.sdocs").head().getLong(0) == 20L)

    // DELETE FROM with string equality and IN
    spark.sql("DELETE FROM gcat.db.sdocs WHERE doc_id = 'doc-0002'")
    spark.sql("DELETE FROM gcat.db.sdocs WHERE doc_id IN ('doc-0003', 'doc-0004')")
    assert(spark.sql("SELECT count(*) FROM gcat.db.sdocs").head().getLong(0) == 17L)
    assert(CommitLog.history(spark, root).orderBy(col("version").desc)
      .head().getAs[String]("op") == "delete")

    // keyed UPDATE on the string key (the degenerate merge, string domain)
    spark.sql("UPDATE gcat.db.sdocs SET body = 'PATCHED' WHERE doc_id = 'doc-0005'")
    assert(spark.sql("SELECT body FROM gcat.db.sdocs WHERE doc_id = 'doc-0005'")
      .head().getString(0) == "PATCHED")
    assert(spark.sql("SELECT count(*) FROM gcat.db.sdocs").head().getLong(0) == 17L)
  }

  test("composite-key MERGE INTO (r19): tuple upsert from SQL; CDC delete stays single-keyed") {
    import spark.implicits._
    val root = s"$wh/db/comp"
    spark.sql("CREATE TABLE gcat.db.comp (tenant STRING, k BIGINT, v STRING)")
    CommitLog.mergeComposite(
      (for (t <- Seq("a", "b"); i <- 1L to 5L) yield (t, i, s"$t$i"))
        .toDF("tenant", "k", "v"), root, Seq("tenant", "k"))
    Seq(("b", 3L, "UPD"), ("c", 1L, "NEW")).toDF("tenant", "k", "v")
      .createOrReplaceTempView("comp_src")
    val v = spark.sql(
      """MERGE INTO gcat.db.comp t USING comp_src s
         ON t.tenant = s.tenant AND t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").head().getLong(0)
    assert(v == CommitLog.headVersion(spark, root))
    assert(spark.sql("SELECT v FROM gcat.db.comp WHERE tenant = 'b' AND k = 3")
      .head().getString(0) == "UPD")
    assert(spark.sql("SELECT count(*) FROM gcat.db.comp").head().getLong(0) == 11L)
    // same k, different tenants: distinct tuples, no cardinality violation
    Seq(("a", 9L, "A9"), ("b", 9L, "B9")).toDF("tenant", "k", "v")
      .createOrReplaceTempView("comp_src2")
    spark.sql("""MERGE INTO gcat.db.comp t USING comp_src2 s
                 ON t.tenant = s.tenant AND t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(spark.sql("SELECT count(*) FROM gcat.db.comp WHERE k = 9").head().getLong(0) == 2L)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    def declined(sql: String, marker: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains(marker)), chain(e).map(_.getMessage))
    }
    // duplicate tuple in the source is still the cardinality violation
    Seq(("a", 9L, "X"), ("a", 9L, "Y")).toDF("tenant", "k", "v")
      .createOrReplaceTempView("comp_dup")
    declined("""MERGE INTO gcat.db.comp t USING comp_dup s
                ON t.tenant = s.tenant AND t.k = s.k
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""", "one row per key")
    // the CDC delete clause is single-keyed by contract
    Seq(("a", 1L, "D", "D")).toDF("tenant", "k", "v", "op")
      .createOrReplaceTempView("comp_cdc")
    declined("""MERGE INTO gcat.db.comp t USING comp_cdc s
                ON t.tenant = s.tenant AND t.k = s.k
                WHEN MATCHED AND s.op = 'D' THEN DELETE
                WHEN MATCHED THEN UPDATE SET tenant = s.tenant, k = s.k, v = s.v
                WHEN NOT MATCHED AND NOT (s.op = 'D') THEN INSERT (tenant, k, v) VALUES (s.tenant, s.k, s.v)""",
      "single-keyed")
  }

  test("composite DELETE FROM (r19): a key-column conjunction removes exactly the matching tuples, delta-sized") {
    import spark.implicits._
    val root = s"$wh/db/cdel"
    spark.sql("CREATE TABLE gcat.db.cdel (tenant STRING, k BIGINT, v STRING)")
    CommitLog.mergeComposite(
      (for (t <- Seq("a", "b"); i <- 1L to 10L) yield (t, i, s"$t$i"))
        .toDF("tenant", "k", "v"), root, Seq("tenant", "k"))
    val before = CommitLog.liveFiles(spark, root)
    // tenant bloom excludes the 'a' half? both tenants share files here —
    // the semantic check is the point: exactly the (b, {3,4}) tuples go
    spark.sql("DELETE FROM gcat.db.cdel WHERE tenant = 'b' AND k IN (3, 4)")
    val snap = spark.sql("SELECT tenant, k FROM gcat.db.cdel").as[(String, Long)]
      .collect().toSet
    assert(!snap.contains(("b", 3L)) && !snap.contains(("b", 4L)))
    assert(snap.contains(("a", 3L)) && snap.contains(("a", 4L)), "other tenant intact")
    assert(snap.size == 18)
    assert(CommitLog.history(spark, root).orderBy(col("version").desc)
      .head().getAs[String]("op") == "delete")
    // a conjunction including a DATA column is honored exactly too (it
    // is still just a conjunction of equality predicates)
    spark.sql("DELETE FROM gcat.db.cdel WHERE k = 5 AND v = 'a5'")
    val s2 = spark.sql("SELECT tenant, k FROM gcat.db.cdel").as[(String, Long)]
      .collect().toSet
    assert(!s2.contains(("a", 5L)) && s2.contains(("b", 5L)))
    // no matching tuple: no commit
    val head = CommitLog.headVersion(spark, root)
    spark.sql("DELETE FROM gcat.db.cdel WHERE tenant = 'zz' AND k = 1")
    assert(CommitLog.headVersion(spark, root) == head)
    before.size: Unit
  }

  test("SQL UPDATE (r19): keyed shape lands one delta-sized merge; self-referential SET; non-keyed shapes decline loudly") {
    import spark.implicits._
    val root = s"$wh/db/upd"
    spark.sql("CREATE TABLE gcat.db.upd (k BIGINT, s STRING, bal BIGINT)")
    CommitLog.append((1L to 10L).map(i => (i, s"s$i", i * 100L))
      .toDF("k", "s", "bal").coalesce(1), root, statsFor = Seq("k"))
    CommitLog.append((11L to 20L).map(i => (i, s"s$i", i * 100L))
      .toDF("k", "s", "bal").coalesce(1), root, statsFor = Seq("k"))
    val before = CommitLog.liveFiles(spark, root)

    // keyed UPDATE: one delta-sized merge version, only the holding file rewritten
    val v = spark.sql("UPDATE gcat.db.upd SET s = 'X' WHERE k = 5").head().getLong(0)
    assert(v == CommitLog.headVersion(spark, root))
    assert(CommitLog.history(spark, root).orderBy(col("version").desc)
      .head().getAs[String]("op") == "merge")
    // before(0) is the CREATE's zero-row schema file; k=5 lives in before(1)
    val after = CommitLog.liveFiles(spark, root)
    assert(after.toSet.intersect(before.toSet) == before.toSet - before(1),
      s"only ${before(1)} holds k=5; before=$before after=$after")
    assert(spark.sql("SELECT s FROM gcat.db.upd WHERE k = 5").head().getString(0) == "X")
    assert(spark.sql("SELECT count(*) FROM gcat.db.upd").head().getLong(0) == 20L)

    // self-referential SET over an IN key set
    spark.sql("UPDATE gcat.db.upd SET bal = bal + 10 WHERE k IN (1, 2, 999)")
    assert(spark.sql("SELECT sum(bal) FROM gcat.db.upd WHERE k IN (1, 2)")
      .head().getLong(0) == 100L + 200L + 20L)

    // absent key: no commit, version −1
    val preMiss = CommitLog.headVersion(spark, root)
    assert(spark.sql("UPDATE gcat.db.upd SET s = 'Z' WHERE k = 777").head().getLong(0) == -1L)
    assert(CommitLog.headVersion(spark, root) == preMiss)

    // txn token replay no-ops
    spark.conf.set("graft.catalog.txnId", "upd-tok-1")
    try {
      spark.sql("UPDATE gcat.db.upd SET s = 'T' WHERE k = 6")
      val vTok = CommitLog.headVersion(spark, root)
      assert(spark.sql("UPDATE gcat.db.upd SET s = 'T2' WHERE k = 6").head().getLong(0) == -1L)
      assert(CommitLog.headVersion(spark, root) == vTok)
      assert(spark.sql("SELECT s FROM gcat.db.upd WHERE k = 6").head().getString(0) == "T")
    } finally spark.conf.unset("graft.catalog.txnId")

    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    def declined(sql: String, marker: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains(marker)), chain(e).map(_.getMessage))
    }
    declined("UPDATE gcat.db.upd SET s = 'A'", "full-table rewrite")
    declined("UPDATE gcat.db.upd SET s = 'A' WHERE k > 5", "equality/IN")
    declined("UPDATE gcat.db.upd SET s = 'A' WHERE k = 5 AND s = 's5'", "equality/IN")
    declined("UPDATE gcat.db.upd SET s = 'A' WHERE bal = 100 OR k = 5", "equality/IN")
    declined("UPDATE gcat.db.upd SET k = 99 WHERE k = 5", "must not assign the key column")
    // no declined shape mutated the table
    assert(spark.sql("SELECT count(*) FROM gcat.db.upd").head().getLong(0) == 20L)
  }

  test("CDC op-code batch (r19): conditional WHEN MATCHED DELETE beside the upsert splits into ordered delete+merge commits under one token pair") {
    import spark.implicits._
    val root = s"$wh/db/cdc"
    spark.sql("CREATE TABLE gcat.db.cdc (k BIGINT, s STRING)")
    CommitLog.append((1L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), root,
      statsFor = Seq("k"))

    def cdcSql(view: String) =
      s"""MERGE INTO gcat.db.cdc t USING $view s ON t.k = s.k
          WHEN MATCHED AND s.op = 'D' THEN DELETE
          WHEN MATCHED THEN UPDATE SET k = s.k, s = s.s
          WHEN NOT MATCHED AND NOT (s.op = 'D') THEN INSERT (k, s) VALUES (s.k, s.s)"""

    // mixed batch: delete 2 (matched) and 12 (unmatched → no-op, NOT
    // resurrected), update 3, insert 11
    Seq((2L, "", "D"), (12L, "", "D"), (3L, "U3", "U"), (11L, "N11", "U"))
      .toDF("k", "s", "op").createOrReplaceTempView("cdc_b1")
    spark.conf.set("graft.catalog.txnId", "cdc-tok-1")
    try {
      spark.sql(cdcSql("cdc_b1")).collect()
      val got = spark.sql("SELECT k, s FROM gcat.db.cdc ORDER BY k")
        .as[(Long, String)].collect().toSeq
      val want = ((1L to 11L).filterNot(_ == 2L).map(i => (i, s"s$i")).toMap
        + (3L -> "U3") + (11L -> "N11")).toSeq.sorted
      assert(got == want)
      // the statement landed as delete THEN merge
      val ops = CommitLog.history(spark, root).orderBy(col("version"))
        .collect().map(_.getAs[String]("op")).toSeq
      assert(ops.takeRight(2) == Seq("delete", "merge"), ops)
      // full-statement replay under the same token: both halves no-op
      val head = CommitLog.headVersion(spark, root)
      spark.sql(cdcSql("cdc_b1")).collect()
      assert(CommitLog.headVersion(spark, root) == head, "token pair must replay as no-op")
    } finally spark.conf.unset("graft.catalog.txnId")

    // all-delete batch: one delete commit, no junk empty merge version
    Seq((4L, "", "D")).toDF("k", "s", "op").createOrReplaceTempView("cdc_b2")
    val preDel = CommitLog.headVersion(spark, root)
    spark.sql(cdcSql("cdc_b2")).collect()
    assert(CommitLog.headVersion(spark, root) == preDel + 1)
    assert(CommitLog.history(spark, root).orderBy(col("version").desc)
      .head().getAs[String]("op") == "delete")

    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    def declined(sql: String, marker: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains(marker)), chain(e).map(_.getMessage))
    }
    // a key in BOTH halves is the SQL multi-match cardinality violation
    Seq((5L, "x", "D"), (5L, "y", "U")).toDF("k", "s", "op")
      .createOrReplaceTempView("cdc_dup")
    declined(cdcSql("cdc_dup"), "one row per key")
    // the insert must carry the delete condition's negation
    Seq((6L, "", "D")).toDF("k", "s", "op").createOrReplaceTempView("cdc_g")
    declined("""MERGE INTO gcat.db.cdc t USING cdc_g s ON t.k = s.k
                WHEN MATCHED AND s.op = 'D' THEN DELETE
                WHEN MATCHED THEN UPDATE SET k = s.k, s = s.s
                WHEN NOT MATCHED THEN INSERT (k, s) VALUES (s.k, s.s)""",
      "guarded by the delete condition's negation")
    declined("""MERGE INTO gcat.db.cdc t USING cdc_g s ON t.k = s.k
                WHEN MATCHED AND s.op = 'D' THEN DELETE
                WHEN MATCHED THEN UPDATE SET k = s.k, s = s.s
                WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (k, s) VALUES (s.k, s.s)""",
      "delete condition's negation")
    // the delete condition must be source-only (checked before the
    // insert guard, so the guard below never needs to match it)
    declined("""MERGE INTO gcat.db.cdc t USING cdc_g s ON t.k = s.k
                WHEN MATCHED AND t.s = 'gone' THEN DELETE
                WHEN MATCHED THEN UPDATE SET k = s.k, s = s.s
                WHEN NOT MATCHED AND NOT (s.op = 'D') THEN INSERT (k, s) VALUES (s.k, s.s)""",
      "only source columns")
    // no declined shape mutated the table (10 − {2,4} + {11} = 9)
    assert(spark.sql("SELECT count(*) FROM gcat.db.cdc").head().getLong(0) == 9L)
  }

  test("changes windowed below a schema evolution null-fills the added column instead of throwing") {
    import spark.implicits._
    val root = s"$wh/db/evch"
    CommitLog.append(Seq((1L, "a")).toDF("k", "s"), root)
    CommitLog.append(Seq((2L, "b", 9L)).toDF("k", "s", "w"), root) // evolves +w
    // the windowed read unifies only v1's files, which lack w — the
    // presentation schema still carries it, null-filled
    val rows = spark.sql(
      "SELECT k, w FROM gcat.db.evch.changes WHERE _commit_version = 1")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSeq
    assert(rows == Seq((1L, true)))
    // the full feed serves both versions, old rows null-filled
    val all = spark.sql(
      "SELECT k, w FROM gcat.db.evch.changes ORDER BY k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(all == Seq((1L, -1L), (2L, 9L)))
  }

  test("SQL ops surface: t.history audits, t.changes feeds CDC with version pruning, CALL system.{compact,checkpoint,restore,vacuum}") {
    import spark.implicits._
    val root = s"$wh/db/ops"
    CommitLog.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, None, Seq("k"))
    CommitLog.append(Seq((3L, "c")).toDF("k", "s"), root, None, Seq("k"))

    // DESCRIBE HISTORY from SQL: the commit audit as a metadata table
    val hist = spark.sql(
      "SELECT version, op, n_added FROM gcat.db.ops.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist == Seq((1L, "append"), (2L, "append")), hist)

    // table_changes from SQL: every version's added rows, tagged
    val all = spark.sql(
      "SELECT k, _commit_version, _commit_op FROM gcat.db.ops.changes ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(all == Seq((1L, 1L, "append"), (2L, 1L, "append"), (3L, 2L, "append")), all)
    // a version predicate prunes the commit walk to the delta
    val delta = spark.sql(
      "SELECT k FROM gcat.db.ops.changes WHERE _commit_version > 1")
      .collect().map(_.getLong(0)).toSeq
    assert(delta == Seq(3L))

    // OPTIMIZE from SQL: compact + cluster, files fold to one, rows intact
    val v3 = spark.sql(
      "CALL gcat.system.compact(`table` => 'db.ops', cluster_by => 'k')")
      .head().getLong(0)
    assert(v3 == 3L)
    assert(CommitLog.liveFiles(spark, root).size == 1)
    assert(spark.sql("SELECT count(*) FROM gcat.db.ops").head().getLong(0) == 3L)
    // a compaction is dataChange=false: the change feed is UNCHANGED
    assert(spark.sql("SELECT count(*) FROM gcat.db.ops.changes")
      .head().getLong(0) == 3L)

    // checkpoint from SQL
    assert(spark.sql("CALL gcat.system.checkpoint(`table` => 'db.ops')")
      .head().getLong(0) == 3L)

    // restore from SQL: metadata-only rollback to v1 as a new commit
    val v4 = spark.sql(
      "CALL gcat.system.restore(`table` => 'db.ops', version => 1)")
      .head().getLong(0)
    assert(v4 == 4L)
    assert(spark.sql("SELECT count(*) FROM gcat.db.ops").head().getLong(0) == 2L)

    // vacuum from SQL with the retention window; below-window time travel
    // then fails with the retention contract
    val n = spark.sql(
      "CALL gcat.system.vacuum(`table` => 'db.ops', retain_last => 1)")
      .head().getLong(0)
    assert(n >= 1L, s"expected reclaimed files, got $n")
    assert(spark.sql("SELECT count(*) FROM gcat.db.ops").head().getLong(0) == 2L)
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat.db.ops VERSION AS OF 2").collect()
    }
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("reclaimed by vacuum")), chain(e).map(_.getMessage))

    // unknown procedure / table decline loudly
    val e2 = intercept[Exception] {
      spark.sql("CALL gcat.system.nosuch(`table` => 'db.ops')").collect()
    }
    assert(chain(e2).exists(t => t.getMessage != null &&
      (t.getMessage.contains("no procedure") || t.getMessage.contains("nosuch"))))
    val e3 = intercept[Exception] {
      spark.sql("CALL gcat.system.checkpoint(`table` => 'db.nosuch')").collect()
    }
    assert(chain(e3).exists(t => t.getMessage != null &&
      t.getMessage.contains("no graft table")))
  }

  test("cluster keys from SQL: TBLPROPERTIES clusterBy shapes every insert, CALL compact defaults to it, skipping matches the API-clustered twin") {
    import spark.implicits._
    spark.sql(
      "CREATE TABLE gcat.db.clus (k BIGINT, v BIGINT) TBLPROPERTIES ('clusterBy'='k')")
    val rootSql = s"$wh/db/clus"
    assert(CommitLog.properties(spark, rootSql) == Map("clusterBy" -> "k"))
    assert(spark.sql("SHOW TBLPROPERTIES gcat.db.clus").collect().exists(r =>
      r.getString(0) == "clusterBy" && r.getString(1) == "k"))

    // an UNSORTED 4-partition insert still lands range-clustered: each
    // data file owns a contiguous k-run, so a point probe admits ONE file
    val df = (1L to 4000L).sortBy(k => (k * 2654435761L) % 4000)
      .map(k => (k, k * 7)).toDF("k", "v").repartition(4)
    df.createOrReplaceTempView("clus_src")
    spark.sql("INSERT INTO gcat.db.clus SELECT * FROM clus_src")
    val stats1 = CommitLog.statFold(CommitLog.log(spark, rootSql), "k")
    val statted = CommitLog.liveFiles(spark, rootSql).filter(stats1.contains)
    assert(statted.size >= 2, s"expected a multi-file clustered insert, got ${statted.size}")
    for (probe <- Seq(42L, 2000L, 3999L))
      assert(statted.count(f =>
        stats1(f).min <= probe && probe <= stats1(f).max) == 1,
        s"point probe $probe must admit exactly one file of a range-clustered insert")

    // API twin: unshaped append, then the API clustering compact
    val rootApi = s"$wh/db/clus_api"
    CommitLog.append(df, rootApi, None, Seq("k"))
    CommitLog.compact(spark, rootApi, partitions = 4,
      statsFor = Seq("k"), clusterBy = Seq("k"))
    // SQL twin: CALL compact with NO cluster_by — falls back to the property
    spark.sql("CALL gcat.system.compact(`table` => 'db.clus', partitions => 4)")

    // spec-pin: the SQL-declared table's skipping equals the API twin's —
    // same admitted-file count per probe range, same rows served
    def admitted(root: String, lo: Long, hi: Long): Int = {
      val st = CommitLog.statFold(CommitLog.log(spark, root), "k")
      CommitLog.liveFiles(spark, root).filter(st.contains)
        .count(f => st(f).max >= lo && st(f).min <= hi)
    }
    for ((lo, hi) <- Seq((42L, 42L), (100L, 200L), (3500L, 4000L))) {
      assert(admitted(rootSql, lo, hi) == admitted(rootApi, lo, hi),
        s"[$lo,$hi]: SQL-clustered table must skip like the API-clustered twin")
      assert(admitted(rootSql, lo, hi) == 1)
      assert(CommitLog.snapshotRange(spark, rootSql, "k", lo, hi)._1.count() ==
        CommitLog.snapshotRange(spark, rootApi, "k", lo, hi)._1.count())
    }
    // declaring an unknown cluster column is declined at CREATE
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.clus_bad (k BIGINT) TBLPROPERTIES ('clusterBy'='nope')")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("unknown column")), chain(e).map(_.getMessage))

    // ALTER TABLE can set/unset the maintenance properties on an
    // EXISTING table; schema changes keep the reader-side contract
    spark.sql("ALTER TABLE gcat.db.clus SET TBLPROPERTIES ('clusterBy'='v')")
    assert(CommitLog.properties(spark, rootSql) == Map("clusterBy" -> "v"))
    spark.sql("ALTER TABLE gcat.db.clus UNSET TBLPROPERTIES ('clusterBy')")
    assert(CommitLog.properties(spark, rootSql) == Map.empty)
    spark.sql("ALTER TABLE gcat.db.clus SET TBLPROPERTIES ('clusterBy'='k')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.clus SET TBLPROPERTIES ('clusterBy'='nope')")
    }
    assert(chain(e2).exists(t => t.getMessage != null &&
      t.getMessage.contains("unknown column")))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.clus ADD COLUMN extra BIGINT")
    }
    assert(chain(e3).exists(t => t.getMessage != null &&
      (t.getMessage.contains("reader-side") || t.getMessage.contains("unsupported change"))),
      chain(e3).map(_.getMessage))
  }

  test("DDL surface: SHOW TABLES lists, RENAME moves, DROP removes; partition transforms and writes to time travel are rejected") {
    spark.sql("CREATE TABLE gcat.db.ddl1 (k BIGINT)")
    val names = spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(names.contains("ddl1"))
    spark.sql("ALTER TABLE gcat.db.ddl1 RENAME TO gcat.db.ddl2")
    assert(spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getAs[String]("tableName")).toSet.contains("ddl2"))
    spark.sql("DROP TABLE gcat.db.ddl2")
    assert(!spark.sql("SHOW TABLES IN gcat.db").collect()
      .map(_.getAs[String]("tableName")).toSet.contains("ddl2"))

    val pe = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.db.part (k BIGINT) PARTITIONED BY (k)")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(pe).exists(t => t.getMessage != null &&
      t.getMessage.contains("no partition transforms")))

    // a time-traveled table is read-only (catalog-level contract)
    val cat = new graft.sources.GraftCatalog
    cat.initialize("gcat",
      new CaseInsensitiveStringMap(Map("warehouse" -> wh).asJava))
    val t = cat.loadTable(Identifier.of(Array("db"), "evo"), "1")
    val we = intercept[UnsupportedOperationException] {
      t.asInstanceOf[SupportsWrite].newWriteBuilder(null)
    }
    assert(we.getMessage.contains("time-traveled"))
  }
}
