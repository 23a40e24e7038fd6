package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}
import graft.ext.{Frequency, Retrieval, TextStats, Vocab}

/** Corpus retrieval / tokenization / robust-stats queries over the
  * `documents` table: inverted index, BM25 ranked search, vocabulary
  * encoding, and per-group winsorization. Every oracle spells out the
  * identical arithmetic in DuckDB (numeric literals cast `::DOUBLE`
  * explicitly — DuckDB parses bare decimal literals as DECIMAL, whose
  * arithmetic rounds differently from the IEEE doubles Spark uses).
  */
object RetrievalQueries extends QueryGroup {

  import Tables.load
  import ExtQueries.toksSql

  /** Inverted index: term → df, total_tf, top-10 postings by (tf DESC,
    * doc_id ASC) — the posting cap happens INSIDE the aggregation
    * (bounded TopKAgg buffers), so a Zipf-hot term never ships its full
    * posting universe through the shuffle. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    Retrieval.invertedIndex(load(spark, dir, "documents"), maxPostings = 10)
      .orderBy($"term")

  private val invertedIndexSql =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |tf AS (SELECT term, doc_id, count(*) AS tf
       |       FROM t WHERE term != '' GROUP BY term, doc_id),
       |r AS (SELECT term, doc_id, tf,
       |             row_number() OVER (PARTITION BY term
       |               ORDER BY tf DESC, doc_id) AS rn FROM tf),
       |a AS (SELECT term, count(*) AS df, sum(tf)::BIGINT AS total_tf
       |      FROM tf GROUP BY term),
       |p AS (SELECT term, string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR,
       |               ',' ORDER BY tf DESC, doc_id) AS postings
       |      FROM r WHERE rn <= 10 GROUP BY term)
       |SELECT a.term, a.df, a.total_tf, p.postings
       |FROM a JOIN p USING (term) ORDER BY a.term""".stripMargin

  /** BM25 top-5 retrieval for 5 probe documents (doc_id % 100 = 0)
    * against the whole corpus. Scores are per-term floor-quantized q4
    * integers summed exactly, so the ranking is bit-reproducible
    * cross-engine (see Retrieval.bm25TopK). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    Retrieval.bm25TopK(docs, docs.where($"doc_id" % 100 === 0), k = 5)
      .orderBy($"q_id", $"rank")
  }

  private val bm25TopKSql =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |tf AS (SELECT term, doc_id AS n_id, count(*) AS tf
       |       FROM t WHERE term != '' GROUP BY term, doc_id),
       |dl AS (SELECT n_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY n_id),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
       |          FROM dl),
       |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM t
       |       WHERE doc_id % 100 = 0 AND term != ''),
       |c AS (
       |  SELECT qt.q_id, tf.n_id,
       |    floor(
       |      (ln(1.0::DOUBLE + (s.n_docs - f.df + 0.5::DOUBLE)
       |                        / (f.df + 0.5::DOUBLE))
       |       * ((tf.tf * (1.2::DOUBLE + 1.0::DOUBLE))
       |          / (tf.tf + 1.2::DOUBLE *
       |              ((1.0::DOUBLE - 0.75::DOUBLE)
       |               + (0.75::DOUBLE * dl.dl)
       |                 / (s.sum_dl::DOUBLE / s.n_docs::DOUBLE)))))
       |      * 10000.0::DOUBLE)::BIGINT AS c_q4
       |  FROM tf JOIN qt USING (term) JOIN dfreq f USING (term)
       |          JOIN dl USING (n_id) CROSS JOIN stats s
       |  WHERE qt.q_id != tf.n_id),
       |sc AS (SELECT q_id, n_id, sum(c_q4)::BIGINT AS score_q4
       |       FROM c GROUP BY q_id, n_id),
       |r AS (SELECT q_id, n_id, score_q4,
       |             row_number() OVER (PARTITION BY q_id
       |               ORDER BY score_q4 DESC, n_id) AS rank FROM sc)
       |SELECT q_id, rank::BIGINT AS rank, n_id, score_q4
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Vocabulary encode: top-24 pieces by (count DESC, piece ASC) get
    * ids 1..24 (the corpus has 31 distinct pieces, so OOV → 0 really
    * occurs); each doc emits its piece count, OOV count, and the first
    * 32 ids as csv. The encode pass is a zero-shuffle map-literal scan. */
  def tokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    Vocab.encode(docs, Vocab.buildVocab(docs, size = 24), headIds = 32)
      .orderBy($"doc_id")
  }

  private val piecesSql =
    s"regexp_extract_all(lower(coalesce(text, '')), '${TextStats.pieceRegexp}')"

  private val tokenizeIdsSql =
    s"""WITH pc AS (
       |  SELECT unnest($piecesSql) AS piece FROM documents),
       |cnt AS (SELECT piece, count(*) AS n FROM pc GROUP BY piece),
       |v AS (SELECT piece, id FROM (
       |        SELECT piece, row_number() OVER (ORDER BY n DESC, piece) AS id
       |        FROM cnt) WHERE id <= 24),
       |d AS (SELECT doc_id, $piecesSql AS ps FROM documents),
       |e AS (SELECT doc_id, unnest(list_transform(range(1, len(ps) + 1),
       |        i -> struct_pack(pos := i, piece := ps[i]))) AS u FROM d),
       |ep AS (SELECT doc_id, u.pos AS pos, u.piece AS piece FROM e),
       |j AS (SELECT ep.doc_id, ep.pos, coalesce(v.id, 0) AS tid
       |      FROM ep LEFT JOIN v ON ep.piece = v.piece),
       |ids AS (SELECT doc_id, list(tid ORDER BY pos) AS ids
       |        FROM j GROUP BY doc_id)
       |SELECT d.doc_id, len(d.ps)::BIGINT AS n_pieces,
       |       coalesce(len(list_filter(i.ids, x -> x = 0)), 0)::BIGINT AS n_oov,
       |       coalesce(array_to_string(i.ids[1:32], ','), '') AS ids_csv
       |FROM d LEFT JOIN ids i USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Winsorization: clip n_chars at the exact per-language [p05, p95]
    * (distributed-selection quantiles; the GROUP-sized bounds table
    * broadcasts back — the row side never shuffles). */
  def winsorize(spark: SparkSession, dir: String): DataFrame =
    Frequency.winsorize(load(spark, dir, "documents"), "lang", "n_chars",
        0.05, 0.95)
      .select($"doc_id", $"lang", $"n_chars",
        $"lo".cast("long").as("lo"), $"hi".cast("long").as("hi"),
        $"clipped".cast("long").as("clipped"), $"was_clipped")
      .orderBy($"doc_id")

  private val winsorizeSql =
    """WITH q AS (
      |  SELECT lang, quantile_disc(n_chars, 0.05) AS lo,
      |         quantile_disc(n_chars, 0.95) AS hi
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY lang)
      |SELECT d.doc_id, d.lang, d.n_chars,
      |       q.lo::BIGINT AS lo, q.hi::BIGINT AS hi,
      |       least(greatest(d.n_chars, q.lo), q.hi)::BIGINT AS clipped,
      |       (d.n_chars < q.lo OR d.n_chars > q.hi) AS was_clipped
      |FROM documents d JOIN q USING (lang)
      |WHERE d.n_chars IS NOT NULL ORDER BY d.doc_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("ext_inverted_index", invertedIndex, Some(invertedIndexSql)),
    QueryDef("ext_bm25_topk", bm25TopK, Some(bm25TopKSql)),
    QueryDef("ext_tokenize_ids", tokenizeIds, Some(tokenizeIdsSql)),
    QueryDef("ext_winsorize", winsorize, Some(winsorizeSql)))
}
