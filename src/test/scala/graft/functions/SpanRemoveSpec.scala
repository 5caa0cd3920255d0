package graft.functions

import graft.SparkSpecBase
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SpanRemoveSpec extends SparkSpecBase {

  /** The pre-kernel tail as the REFERENCE implementation: covered-position
    * explode + distinct, token posexplode + anti-join, per-doc
    * collect_list reassembly — the shape spanRemoval shipped through r12.
    * The kernel must be bit-identical to this composition. */
  private def referenceSpanRemoval(df: DataFrame, id: String, text: String,
                                   l: Int): DataFrame = {
    val toks = split(col(text), "\\s+")
    val nGrams = greatest(size(toks) - (l - 1), lit(1))
    val gramArr = transform(sequence(lit(1), nGrams),
      i => lower(concat_ws(" ", slice(toks, i, lit(l)))))
    val positions = df.select(col(id), posexplode(gramArr).as(Seq("pos0", "gram")))
      .select(col(id), (col("pos0") + 1).as("pos"), col("gram"))
    val firstDoc = positions.groupBy(col("gram"))
      .agg(min(col(id)).as("__first_doc"), max(col(id)).as("__max_doc"))
      .filter(col("__max_doc") > col("__first_doc"))
      .select(col("gram"), col("__first_doc"))
    val removable = positions.join(firstDoc, Seq("gram"))
      .filter(col(id) > col("__first_doc"))
      .select(col(id), col("pos"))
    val covered = removable
      .select(col(id), explode(sequence(col("pos"), col("pos") + (l - 1))).as("t"))
      .distinct()
    val tokenTable = df
      .select(col(id), posexplode(toks).as(Seq("t0", "tok")))
      .select(col(id), (col("t0") + 1).as("t"), col("tok"))
    val kept = tokenTable.join(covered, Seq(id, "t"), "left_anti")
    val rebuilt = kept.groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("t"), col("tok")))),
            x => x("tok"))).as("clean_text"))
    df.select(col(id), size(toks).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private def collected(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("kernel tail is bit-identical to the shuffled composition on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val got = collected(Dedup.spanRemoval(docs, "doc_id", "text", l = 8))
    val ref = collected(referenceSpanRemoval(docs, "doc_id", "text", l = 8))
    assert(got === ref)
    // the corpus actually exercises removal (planted near/exact copies)
    assert(got.exists(r => r._3 < r._2), "no doc had a span removed — weak corpus")
  }

  test("kernel tail matches the composition on tokenization edge cases") {
    val s = spark; import s.implicits._
    val df = Seq(
      (0L, "a b c d e f g h tail"),        // first doc — untouched
      (1L, "a b c d e f g h other end"),   // shares the 8-gram prefix
      (2L, ""),                            // empty text -> one empty token
      (3L, "  a b c d e f g h  "),         // leading/trailing whitespace
      (4L, "a\u00A0b c"),                  // NBSP is NOT \s in Java regex
      (5L, "a b c d e f g h"),             // fully covered -> empty output
      (6L, "x y")                          // shorter than l
    ).toDF("doc_id", "text")
    val got = collected(Dedup.spanRemoval(df, "doc_id", "text", l = 8))
    val ref = collected(referenceSpanRemoval(df, "doc_id", "text", l = 8))
    assert(got === ref)
    // the fully-covered doc really ends empty through BOTH paths
    assert(got.find(_._1 == 5L).get._3 === 0L)
    assert(got.find(_._1 == 5L).get._4 === "")
  }

  test("kernel clamps spans past the token count and ignores sub-1 starts") {
    val s = spark; import s.implicits._
    // direct expression call: starts beyond/athwart the doc bounds must
    // clamp, not throw or wrap (the n < l regime emits gram position 1
    // with a span longer than the doc)
    val out = Seq(("a b c", Seq[Integer](1)), ("a b c", Seq[Integer](3)),
        ("a b c", Seq[Integer](0)), ("a b c", Seq[Integer](null)))
      .toDF("text", "starts")
      .select(SpanRemove(col("text"), col("starts"), 8).as("r"))
      .select("r.n_tokens", "r.n_kept", "r.clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out(0) === ((3L, 0L, "")))      // covers 1..8 -> clamp to 3
    assert(out(1) === ((3L, 2L, "a b")))   // covers 3..10 -> clamp to 3
    assert(out(2) === ((3L, 0L, "")))      // 0 -> floor at 1, covers all
    assert(out(3) === ((3L, 3L, "a b c"))) // null start ignored, not pos 0
  }
}
