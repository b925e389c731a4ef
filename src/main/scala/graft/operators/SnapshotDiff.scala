package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (SURVEY §2 q88) — the data-versioning primitive
  * under incremental pipelines: given two snapshots of the same table,
  * emit each id that was ADDED, REMOVED, or CHANGED (content digest
  * differs), and nothing for unchanged rows — the output is sized by the
  * CHURN, not the corpus, which is what makes a daily diff of a 100 TB
  * lake cheap to store and act on (it is the input to q50's upsert and
  * q52/q65's incremental dedup).
  *
  * Scale shape: each side reduces to (id, digest) AT THE SCAN — md5 of
  * the concatenated content columns is computed per row before the join,
  * so document text never rides the shuffle; the full-outer join then
  * moves 40-byte rows. On a real lake both snapshots would be bucketed
  * by id and the join co-located; the digest compare is null-safe
  * (NULL content digests as the empty string, identically in both
  * engines).
  *
  * Returns (id, change_type ∈ added|removed|changed).
  */
object SnapshotDiff {

  def diff(
      oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def digested(df: DataFrame) = df.select(
      col(idCol).cast("long").as("id"),
      md5(concat_ws("", contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
        .as("dg"))
    digested(oldSnap).as("o")
      .join(digested(newSnap).as("n"), col("o.id") === col("n.id"), "full_outer")
      .filter(
        col("o.id").isNull || col("n.id").isNull || col("o.dg") =!= col("n.dg"))
      .select(
        coalesce(col("o.id"), col("n.id")).as(idCol),
        when(col("o.id").isNull, lit("added"))
          .when(col("n.id").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change_type"))
  }
}
