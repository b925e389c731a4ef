package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", table A1): the fraction of a document
  * occupied by repeated tokens / the single most common token / the single
  * most common bigram. Training-data pipelines threshold these to drop
  * machine-generated and boilerplate pages before training.
  *
  * Shape (r19): a document's repetition profile is a pure function of its
  * OWN tokens, so the old explode → (doc, term) count → per-doc max/sum
  * double chain (5 exchanges: four aggregations and a join, every token
  * occurrence shuffled twice) computes ROW-LOCALLY instead — sort the
  * token (and bigram) array, run-length encode it with array HOFs, take
  * size/runs/max-run. Zero shuffles, whole-stage codegen, identical
  * values. Peak memory is unchanged in kind: the tokenized array already
  * sat whole in the row before the explode, so the sorted copy is a
  * constant factor, not a new failure mode.
  */
object Repetition {

  /** (longest run, distinct count) of a SORTED string array as ONE
    * aggregate fold — struct(best, nd). Formulated so the lambda touches
    * ONLY its accumulator and element: Catalyst's projection collapse and
    * predicate pushdown freely re-inline column definitions into
    * consuming expressions, and a positional-lambda formulation
    * (element_at(sorted, i) per position) degrades to O(n²·sort) per row
    * the moment `sorted` stops being a bound attribute (measured: q47
    * 8 s → 26 s when the repetition filter was pushed into such a
    * projection). A fold's array operand is evaluated once per enclosing
    * expression evaluation no matter where the optimizer inlines it.
    */
  private def runStats(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("nd")),
      (acc, x) => {
        val cont = acc.getField("prev") === x // null prev (first elem) ⇒ false branch
        val run = when(cont, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          when(cont, acc.getField("nd")).otherwise(acc.getField("nd") + 1L).as("nd"))
      },
      acc => struct(acc.getField("best").as("best"), acc.getField("nd").as("nd")))

  /** Per-document repetition profile over `idCol`/`textCol`:
    * n_tokens, dup_word_frac (1 − distinct/total), top_word_frac,
    * top_bigram_frac. Fractions rounded to 6 dp for engine-stable hashes.
    */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = size(col("__toks"))
    // bigrams with duplicates kept (unlike shingles(): repetition is the
    // signal here, so the distinct-set kernel would erase it)
    val bigrams = zip_with(
      slice(col("__toks"), lit(1), n - 1),
      slice(col("__toks"), lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    // the sort/run-length kernels run in the scan stage; spread a narrow
    // input first (opt guide §2.5 — no-op on multi-file production scans)
    Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      // the old explode-based shape silently dropped null-text docs (an
      // exploded null array emits nothing); keep that contract explicit
      .filter(col(textCol).isNotNull)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), n.as("__n"),
        runStats(sort_array(col("__toks"))).as("__w"),
        runStats(sort_array(bigrams)).as("__b"))
      .select(
        col(idCol),
        col("__n").cast("long").as("n_tokens"),
        round(lit(1.0)
          - col("__w").getField("nd").cast("double") / col("__n"), 6)
          .as("dup_word_frac"),
        round(col("__w").getField("best").cast("double") / col("__n"), 6)
          .as("top_word_frac"),
        // a 1-token doc has no bigrams: its fraction is 0 (the old left
        // join's coalesce), never 0/0
        round(when(col("__n") > 1,
          col("__b").getField("best").cast("double") / (col("__n") - 1))
          .otherwise(lit(0.0)), 6)
          .as("top_bigram_frac"))
  }
}
