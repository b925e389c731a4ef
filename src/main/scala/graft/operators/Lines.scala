package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LINE-wise corpus deduplication (SURVEY §2 q113) — the
  * RefinedWeb/CCNet filter the span family (q71/q78/q111/q112) does not
  * cover: a LINE (newline-delimited) whose normalized form occurs in at
  * least `minDocs` DISTINCT documents is corpus boilerplate — nav bars,
  * cookie banners, share buttons, footers — and is removed from EVERY
  * document (no canonical copy survives: unlike ExactSubstr's "keep one
  * occurrence", a nav bar is noise in all of its occurrences); a document
  * that loses more than `maxRemovedFrac` of its lines is dropped entirely
  * (what remains is chrome, not content — RefinedWeb's document-level
  * escalation of the line rule).
  *
  * Whitespace-only lines are structural, not content: they are never
  * counted toward boilerplate and never removed (and never counted in the
  * removal fraction's denominator).
  *
  * Shape (q78's discipline): the line stream is (doc_id, pos,
  * xxhash64(normalized line)) — 24-byte rows; the boilerplate table is
  * ONE hash-keyed `count_distinct(doc)` aggregation (map-side partials;
  * line TEXT never shuffles); removal positions come back as a per-doc
  * int list and the split array filters IN PLACE. The only join touching
  * text is the final id-keyed join of drop lists onto the corpus.
  */
object Lines {

  /** The nightly ARTIFACT half of line dedup (the [[Dedup.digests]]
    * discipline): the normalized-line hashes occurring in ≥ `minDocs`
    * DISTINCT documents — one (lh) row per boilerplate line, 8 bytes
    * each, persisted by the batch job and consumed by the live gate
    * ([[graft.streaming.StreamLines]]) and by incremental reruns. Text
    * never shuffles: the aggregation is hash-keyed with map-side
    * partials.
    */
  def boilerplateLines(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "a line is boilerplate only if it repeats across docs")
    Spread.ifNarrow(
      docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(col("doc_id"), xxhash64(Dedup.normalized(col("line"))).as("lh"))
      .groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("lh")
  }

  /** (doc_id, n_lines, n_removed, removed_frac, keep, text_clean). */
  def lineDedup(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minDocs: Int = 2, maxRemovedFrac: Double = 0.3): DataFrame = {
    require(minDocs >= 2, "a line is boilerplate only if it repeats across docs")
    // line splitting/hashing runs in the scan stage; spread a narrow input
    // first (opt guide §2.5 — no-op on multi-file production scans)
    val base = Spread.ifNarrow(
      docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("lines"))

    val stream = base
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)
      .select(col("doc_id"), col("pos"),
        xxhash64(Dedup.normalized(col("line"))).as("lh"))
      .localCheckpoint()

    val boiler = stream.groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("lh")

    val drops = stream.join(boiler, Seq("lh"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos").cast("int"))).as("__drops"))

    val counted = base
      .withColumn("__content",
        size(filter(col("lines"), l => length(trim(l)) > 0)))
      .join(drops, Seq("doc_id"), "left")
      .withColumn("__nrem", coalesce(size(col("__drops")), lit(0)))
    counted.select(
      col("doc_id"),
      col("__content").cast("long").as("n_lines"),
      col("__nrem").cast("long").as("n_removed"),
      round(when(col("__content") > 0,
        col("__nrem").cast("double") / col("__content")).otherwise(lit(0.0)), 4)
        .as("removed_frac"),
      (when(col("__content") > 0,
        col("__nrem").cast("double") / col("__content")).otherwise(lit(0.0))
        <= maxRemovedFrac).as("keep"),
      when(col("__drops").isNull, array_join(col("lines"), "\n")).otherwise(
        array_join(
          zip_with(col("lines"), sequence(lit(0), size(col("lines")) - 1),
            (l, i) => when(array_contains(col("__drops"), i.cast("int")), lit(null))
              .otherwise(l)),
          "\n"))
        .as("text_clean"))
  }

  /** INTRA-document line dedup (SURVEY §2 q122) — the within-doc half of
    * the line rule that [[lineDedup]]'s cross-corpus boilerplate pass does
    * not cover: a line whose normalized form already occurred EARLIER in
    * the SAME document is self-repetition (scraper loops, template echo,
    * chat transcripts quoting themselves) and is dropped, keeping the
    * FIRST occurrence (unlike boilerplate, where no copy survives — a
    * repeated content line is still content once). A document whose
    * duplicate fraction exceeds `maxDupFrac` is flagged drop — the Gopher
    * repetition signals (q38) applied as a removal decision.
    *
    * Shape: this is the cheapest operator in the dedup family — ZERO
    * shuffle. The fold over a document's lines is one codegen'd
    * `aggregate` higher-order function per row (seen-hash array + kept
    * array accumulator), so the operator is embarrassingly parallel and
    * scales with scan bandwidth alone; nothing leaves the input
    * partitioning. Membership is `array_contains` over the per-doc seen
    * array — O(L²) in a document's CONTENT line count, fine for web docs
    * (≲10³ lines); pathological million-line docs should be chunked
    * upstream (q73) first.
    *
    * Whitespace-only lines are structural (q113's discipline): never
    * counted, never deduped, always kept in place. Duplicate detection is
    * on `xxhash64(normalized(line))`; the DuckDB twin dedups on the
    * normalized STRING, so the oracle doubles as the collision check (the
    * q71 discipline).
    *
    * Returns (doc_id, n_lines, n_dupes, dup_frac, keep, text_clean) —
    * n_lines counts content lines BEFORE removal.
    */
  def intraDocDedup(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxDupFrac: Double = 0.5): DataFrame = {
    val lines = split(col(textCol), "\n")
    val folded = aggregate(
      lines,
      struct(
        lit(Array.empty[Long]).as("seen"),
        lit(Array.empty[String]).as("kept"),
        lit(0).as("dups"),
        lit(0).as("content")),
      (acc, l) => {
        val h = xxhash64(Dedup.normalized(l))
        when(length(trim(l)) === 0,
          struct(acc.getField("seen"),
            concat(acc.getField("kept"), array(l)).as("kept"),
            acc.getField("dups"), acc.getField("content")))
          .when(array_contains(acc.getField("seen"), h),
            struct(acc.getField("seen"), acc.getField("kept"),
              (acc.getField("dups") + 1).as("dups"),
              (acc.getField("content") + 1).as("content")))
          .otherwise(
            struct(concat(acc.getField("seen"), array(h)).as("seen"),
              concat(acc.getField("kept"), array(l)).as("kept"),
              acc.getField("dups"),
              (acc.getField("content") + 1).as("content")))
      })
    // the O(L²) per-doc fold runs in the scan stage; spread a narrow input
    // first (opt guide §2.5 — no-op on multi-file production scans)
    Spread.ifNarrow(
      docs.filter(col(textCol).isNotNull).select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"), folded.as("f"))
      .select(
        col("doc_id"),
        col("f.content").cast("long").as("n_lines"),
        col("f.dups").cast("long").as("n_dupes"),
        round(when(col("f.content") > 0,
          col("f.dups").cast("double") / col("f.content")).otherwise(lit(0.0)),
          4).as("dup_frac"),
        (when(col("f.content") > 0,
          col("f.dups").cast("double") / col("f.content")).otherwise(lit(0.0))
          <= maxDupFrac).as("keep"),
        array_join(col("f.kept"), "\n").as("text_clean"))
  }
}
