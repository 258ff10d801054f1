package graft

import graft.core.{CountOrProportion, Vocabulary}
import org.apache.spark.sql.functions._

/** Vocabulary semantics (reference vocabulary.py:13-133). */
class VocabularySpec extends SparkSpec {
  import spark.implicits._

  private def obs = Seq("b", "a", "b", "c", "b", "a", null)
    .toDF("el")

  test("fit: UNK pinned at 0, frequency-descending, ties by element") {
    val v = Vocabulary.fit(obs, "el")
    assertSameRows(v.select("element", "n", "idx"), Seq(
      Seq("UNK", 0L, 0),
      Seq("b", 3L, 1),
      Seq("a", 2L, 2),
      Seq("c", 1L, 3)))
    // frequencies over non-null observations (6)
    val freqs = v.orderBy("idx").select("freq").as[Double].collect()
    assert(freqs(1) == 3.0 / 6)
  }

  test("fitFromCounts merges duplicate elements before ranking") {
    // callers may group counts by a wider key (Preprocessor groups by
    // (key, final_key)) — colliding elements must merge to ONE entry
    val counts = Seq(("x", 3L), ("x", 2L), ("y", 4L)).toDF("element", "n")
    val v = Vocabulary.fitFromCounts(counts)
    assertSameRows(v.select("element", "n", "idx"), Seq(
      Seq("UNK", 0L, 0),
      Seq("x", 5L, 1),
      Seq("y", 4L, 2)))
  }

  test("filterRare folds tail mass into UNK and re-indexes densely") {
    // vocabulary.py:84-112: elements below threshold fold into UNK
    val v = Vocabulary.fit(obs, "el")
    val filtered = Vocabulary.filterRare(v, CountOrProportion.count(2), 6)
    assertSameRows(filtered.select("element", "n", "idx"), Seq(
      Seq("UNK", 1L, 0), // absorbed c's count
      Seq("b", 3L, 1),
      Seq("a", 2L, 2)))
  }

  test("lookup: unknown element maps to UNK index 0") {
    val v = Vocabulary.fit(obs, "el")
    val q = Seq("a", "zzz", "b").toDF("x")
    val looked = Vocabulary.lookup(q, "x", v, "idx_out")
    assertSameRows(looked.select("x", "idx_out"), Seq(
      Seq("a", 2), Seq("zzz", 0), Seq("b", 1)))
  }

  test("fitNested flattens array cells while counting, skipping nulls") {
    // vocabulary.py:114-123: nested lists flattened, NaN skipped
    val nested = Seq(
      (1L, Seq("a", "b", "a")),
      (2L, Seq("b", null)),
      (3L, Seq.empty[String]),
      (4L, null)).toDF("id", "els")
    val v = Vocabulary.fitNested(nested, "els")
    assertSameRows(v.select("element", "n", "idx"), Seq(
      Seq("UNK", 0L, 0),
      Seq("a", 2L, 1),
      Seq("b", 2L, 2)))
  }

  test("degenerate vocab detection") {
    val v = Vocabulary.fit(obs, "el")
    assert(!Vocabulary.isDegenerate(v))
    val collapsed = Vocabulary.filterRare(v,
      CountOrProportion.count(100), 6)
    assert(Vocabulary.isDegenerate(collapsed))
  }
}
