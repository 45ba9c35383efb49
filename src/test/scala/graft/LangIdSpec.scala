package graft

import graft.queries.TextQueries

/** Trigram-profile language ID on planted docs — including the short and
  * code-mixed cases that defeat a full-stopword-token heuristic. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def predict(docs: Seq[(Long, String)]): Map[Long, String] =
    TextQueries.langIdTrigram(docs.toDF("doc_id", "text"))
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("short German and French docs classify without full stopwords") {
    val p = predict(Seq(
      1L -> "Der Hund und die Katze spielen im Garten.",
      2L -> "Ich verstehe die Bedeutung dieser Entscheidung nicht.",
      3L -> "Les enfants mangent leur dessert quand ils veulent.",
      4L -> "Cette question est ouverte depuis toujours.",
      5L -> "The quick brown fox jumps over the lazy dog and runs away.",
      6L -> "Los resultados de la cuestión fueron publicados.",
      // code-mixed doc (identifiers carry no language signal; the German
      // prose around them decides)
      7L -> "Der Parameter maxRetries und die gesamte Konfiguration"))
    assert(p(1L) == "de", p)
    assert(p(2L) == "de", p)
    assert(p(3L) == "fr", p)
    assert(p(4L) == "fr", p)
    assert(p(5L) == "en", p)
    assert(p(6L) == "es", p)
    assert(p(7L) == "de", p)
  }

  test("no profile trigram at all yields 'und'") {
    val p = predict(Seq(10L -> "zzz 123 !!", 11L -> ""))
    assert(p(10L) == "und", p)
    assert(p(11L) == "und", p)
  }
}
