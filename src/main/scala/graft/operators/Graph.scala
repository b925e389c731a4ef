package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative GRAPH analytics (SURVEY §2 q103) — PageRank, the canonical
  * Pregel-shaped workload the library lacked: importance scoring over a
  * link graph (domain authority for crawl prioritization, the
  * quality-signal family CommonCrawl/FineWeb pipelines weigh URLs by).
  *
  * Determinism: the WHOLE iteration runs in LONG arithmetic on a fixed
  * 1e-12 grid (the q100 token-budget discipline) — rank mass starts as
  * `scale div N` per node, each edge carries `pr div deg` (integer
  * division, truncation documented as part of the operator's spec, not a
  * float approximation), the damped update is
  * `(15·scale) div (100·N) + (85·Σ contrib) div 100`. No float touches
  * the fixpoint, so any engine/partitioning reproduces every iterate
  * bit-for-bit. The div-floor mass leak (< N·iters·1 grid units, i.e.
  * < 1e-6 of total mass at any realistic N) is deterministic and
  * documented — NOT redistributed, exactly like q100's unspent slack.
  * Overflow-safe: contributions per node sum to ≤ scale = 1e12; the
  * damped product peaks at 85·1e12 ≪ 2^63.
  *
  * Scale shape (the 100 TB story): edges materialize ONCE
  * (localCheckpoint) as (src, dst) longs — 16 bytes/row, text/payload
  * never enters the loop. Each iteration is the classic 2-shuffle round:
  * one join keyed src (ranks ⋈ edges; ranks and degrees share the node
  * key so Catalyst reuses one partitioning), one count-free aggregation
  * keyed dst carrying (dst, long partial) with map-side combine. The
  * driver holds ONE scalar (N). At cluster scale, store edges bucketed by
  * src and the join shuffle disappears; skewed hubs are AQE-splittable
  * because contributions combine associatively. Ranks localCheckpoint per
  * round (q34's lineage bound).
  *
  * Sink-free by construction here: [[purchaseRank]] feeds the BIDIRECTED
  * purchase graph (random walk alternates customer/supplier), so every
  * node with an edge has out-degree ≥ 1 and the dangling-mass term is
  * structurally zero. For general directed graphs, add the standard
  * dangling redistribution before reusing [[pageRank]] on a graph with
  * sinks — it `require`s none exist rather than silently leaking their
  * mass.
  */
object Graph {

  val Scale = 1000000000000L // 1.0 of rank mass, 1e-12 grid

  /** PageRank over an edge list. `edges` must be (srcCol, dstCol) long
    * pairs, deduplicated, with every src also appearing as a dst side
    * effect of bidirection — more precisely: every node must have
    * out-degree ≥ 1 (checked). Returns (node, pr_e12, pr).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, "need 1 <= iters <= 50")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    iterate(e, iters)
  }

  /** The cluster-scale variant of [[pageRank]]: persist the edge list as a
    * SRC-BUCKETED catalog table first, then run the identical fixpoint
    * against the bucketed scan. The per-iteration ranks ⋈ edges join then
    * plans with NO Exchange on the edge side — the bucketed scan's hash
    * distribution already satisfies the join requirement, so only the
    * (N-row) rank vector shuffles each round, never the (≫N-row) edge
    * list — and the out-degree aggregation needs no shuffle at all for the
    * same reason. One bucketed write up front buys `iters` × |edges|
    * shuffle rows back; at 100 TB the edge table is written once and
    * every nightly rank refresh reuses it. GraphSpec asserts both the
    * no-Exchange-above-the-edge-scan plan shape and rank equality with
    * [[pageRank]] bit-for-bit (the all-long grid makes that exact).
    *
    * The edge table is a MANAGED metastore table the operator OVERWRITES:
    * two concurrent callers sharing a warehouse and a table name would
    * clobber each other's edge lists mid-iteration, so the default name is
    * unique per invocation (and the table is dropped afterwards unless the
    * caller names it — a caller-supplied name is the persist-the-index
    * contract: written once, reused across refreshes, owned by the caller).
    */
  def pageRankBucketed(
      spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame, srcCol: String, dstCol: String,
      table: String = "", buckets: Int = 32,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, "need 1 <= iters <= 50")
    val ephemeral = table.isEmpty
    val name =
      if (ephemeral) "graft_pr_edges_" + java.util.UUID.randomUUID().toString.replace("-", "")
      else table
    def build(): DataFrame = {
      graft.sources.BucketedTables.writeBucketed(
        edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        name, "src", buckets)
      iterate(graft.sources.BucketedTables.read(spark, name), iters)
    }
    if (ephemeral) {
      // drop the scratch table on EVERY exit — a failure anywhere from
      // the bucketed write through the last iteration (OOM, cancellation,
      // bad edges) must not leak an orphan managed table per retry; a
      // DROP failure (e.g. the session died — the very thing that killed
      // the iteration) must not MASK the root cause. The fixpoint
      // materializes each round (localCheckpoint) except the last —
      // checkpoint it too so dropping the table can't orphan the
      // returned plan's scan.
      try build().localCheckpoint()
      finally {
        try spark.sql(s"DROP TABLE IF EXISTS $name")
        catch { case e: Throwable =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"could not drop scratch table $name: $e")
        }
      }
    } else build()
  }

  /** Per-(session, key) cache of persisted bucketed edge tables — the
    * [[graft.operators.Perplexity.trainOnce]] amortization applied to the
    * index artifact: a bench loop (or any session running repeated rank
    * refreshes over the same corpus) pays the bucketed WRITE once and every
    * subsequent invocation iterates against the existing table, which is
    * exactly the production contract ([[pageRankBucketed]]'s caller-named
    * path: written once, reused across refreshes). Dead sessions evict
    * from the map and their scratch tables are reaped by the next live
    * caller (see [[bucketedEdgeTableOnce]]).
    */
  private val edgeTableCache = new BuildOnce[String](
    "Graph.bucketedEdgeTableOnce",
    (caller, table) => caller.sql(s"DROP TABLE IF EXISTS $table"),
    identity)

  /** Build (or reuse) the src-bucketed edge table for `key` in this
    * session. `edges` is by-name: only evaluated on a cache miss. The key
    * contract, parameter check and eviction rules live on [[BuildOnce]] —
    * the key must identify the edge CONTENT (fold in source dir +
    * snapshot/batch id, mint a new key when the data changes), or pass
    * `fingerprintBy` (e.g. `"src, dst"` over the edge frame) to fold a
    * one-scan content digest into the key. Unlike the path-addressed
    * index caches, each build here mints a FRESH UUID table name, so a
    * fingerprinted rebuild never aliases an earlier handle's artifact
    * (the r12 ADVICE stale-handle case cannot arise — no versioned-path
    * indirection needed). Eviction drops dead sessions'
    * `graft_pr_edges_*` tables with the CALLING session (same warehouse —
    * one JVM) instead of stranding them until a manual warehouse sweep.
    *
    * Cross-JVM: no build lease here, deliberately (unlike the
    * path-addressed `Pq`/`Bm25.writeIndexOnce`, which serialize on
    * [[graft.sources.BuildLock]]). Each build mints a fresh UUID table
    * name, so two JVMs can never overwrite each other's artifact — and a
    * waiter could not SERVE the winner's table anyway: managed tables
    * live in the session catalog, which does not span JVMs. The cross-JVM
    * cost is therefore a duplicate build (each JVM its own table), never
    * a race.
    */
  def bucketedEdgeTableOnce(
      spark: org.apache.spark.sql.SparkSession, key: String,
      edges: => DataFrame, srcCol: String, dstCol: String,
      buckets: Int = 32, fingerprintBy: Option[String] = None): String = {
    val k = fingerprintBy.fold(key)(e =>
      BuildOnce.versionKey(key, BuildOnce.fingerprint(edges, e)))
    edgeTableCache.getOrBuild(spark, k,
      s"buckets=$buckets,src=$srcCol,dst=$dstCol", {
        val name =
          "graft_pr_edges_" + java.util.UUID.randomUUID().toString.replace("-", "")
        graft.sources.BucketedTables.writeBucketed(
          edges.select(col(srcCol).cast("long").as("src"),
            col(dstCol).cast("long").as("dst")),
          name, "src", buckets)
        name
      },
      // no intendedId: each build mints a FRESH UUID table, so a dead
      // session's entry can never share an artifact id with an in-flight
      // build here. Superseded content versions of the same bare key
      // still GC in-session (the table of an old fingerprint is garbage
      // the moment a new digest builds — nobody can re-derive it).
      supersedes = fingerprintBy.map(_ => BuildOnce.supersedesPrefix(key)))
  }

  /** The damped all-long fixpoint over a prepared (src, dst) edge frame —
    * shared by the checkpointed and bucketed entry points.
    */
  private def iterate(e: DataFrame, iters: Int): DataFrame = {
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // a dst that never occurs as src is a sink: its mass would vanish
    val sinks = e.join(deg, e("dst") === deg("node"), "left_anti").limit(1).count()
    require(sinks == 0L,
      "pageRank: graph has sink nodes (dst never appears as src) - " +
        "bidirect the edges or add dangling-mass handling first")

    val n = deg.count() // the ONE driver scalar
    require(n > 0, "pageRank: empty graph")
    val base = (15L * Scale) / (100L * n)

    // ranks CARRIES deg (r19): the rank vector and the degree table share
    // one node universe, so joining them back together every round was a
    // per-iteration join that re-shuffled the N-row vector for nothing —
    // contribs reads pr and deg off the same row, and `next` left-joins
    // contribs against the vector itself (same node set as deg, so the
    // row universe — and every long — is bit-identical).
    var ranks = deg.select(col("node"), col("deg"), lit(Scale / n).as("pr"))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === col("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val next = ranks
        .join(contribs, ranks("node") === contribs("dst"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + expr("85L * coalesce(s, 0L) div 100L")).as("pr"))
      // checkpoint bounds lineage between rounds — every SECOND round
      // (r19): one round's plan is 3 small exchanges, so a 2-round window
      // keeps planning cost flat while halving the materialization jobs
      // (each checkpoint is its own job over the N-row vector; at 5
      // iterations those jobs were ~a third of the loop's wall time). The
      // LAST round stays a live plan so the caller sees (and plan-audits)
      // the edge-side join.
      ranks = if (i < iters && i % 2 == 0) next.localCheckpoint() else next
    }
    ranks.select(col("node"), col("pr").as("pr_e12"),
      (expr("pr div 1000000L").cast("double") / lit(1000000.0)).as("pr"))
  }

  /** q103's driver row: PageRank over the customer↔supplier purchase
    * graph — who-bought-from-whom, bidirected so the walk alternates
    * sides (and the graph is sink-free). Node encoding packs both key
    * spaces into one long: customer c → 2c, supplier s → 2s+1. Returns
    * (entity_key, kind, pr_e12, pr) ordered nowhere — the driver hash is
    * order-insensitive.
    */
  def purchaseRank(orders: DataFrame, lineitem: DataFrame, iters: Int = 5): DataFrame =
    decode(pageRank(purchaseEdges(orders, lineitem), "src", "dst", iters))

  /** [[purchaseRank]] through [[pageRankBucketed]] — the REGISTERED q103
    * path since r9 (per the r8 verdict): the edge list persists
    * src-bucketed, so the per-iteration ranks ⋈ edges join plans with no
    * Exchange on the edge side and only the N-row rank vector shuffles
    * each round. Ranks are bit-identical to [[purchaseRank]] (the
    * all-long grid; GraphSpec asserts equality), so the oracle is shared.
    */
  def purchaseRankBucketed(
      spark: org.apache.spark.sql.SparkSession,
      orders: DataFrame, lineitem: DataFrame, iters: Int = 5): DataFrame =
    decode(pageRankBucketed(spark, purchaseEdges(orders, lineitem), "src", "dst",
      iters = iters))

  /** [[purchaseRankBucketed]] with the edge-table build AMORTIZED per
    * (session, `key`) via [[bucketedEdgeTableOnce]] — the REGISTERED q103
    * path since r10: the r9 registration rebuilt (and dropped) the managed
    * bucketed table inside every invocation, pricing an artifact write +
    * metastore DROP into each rank refresh (the r9 bench's only >2×
    * regression). Here the write happens once per (session, corpus);
    * every refresh plans the same Exchange-free edge-side join against
    * the existing table. Ranks are bit-identical to [[purchaseRank]]
    * (all-long grid), so the oracle is unchanged.
    */
  def purchaseRankBucketedOnce(
      spark: org.apache.spark.sql.SparkSession, key: String,
      orders: DataFrame, lineitem: DataFrame, iters: Int = 5): DataFrame = {
    val table = bucketedEdgeTableOnce(
      spark, key, purchaseEdges(orders, lineitem), "src", "dst")
    decode(iterate(graft.sources.BucketedTables.read(spark, table), iters))
  }

  private def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def decode(ranks: DataFrame): DataFrame =
    ranks.select(
      expr("node div 2L").as("entity_key"),
      when(col("node") % 2 === 1, lit("supplier")).otherwise(lit("customer")).as("kind"),
      col("pr_e12"), col("pr"))
}
