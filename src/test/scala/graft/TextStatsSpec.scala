package graft

import graft.ext.TextStats
import org.apache.spark.sql.functions._

/** Text-analysis operator goldens: the winnowing guarantee and the
  * BPE-ish piece split — properties the row-level oracle gate doesn't
  * isolate. */
class TextStatsSpec extends SparkSpec {

  import spark.implicits._

  private def fps(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toDF("doc_id", "text")
      .select($"doc_id", TextStats.winnowFingerprints($"text", 5, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("winnowing: docs sharing a substring of length >= k+w-1 share a fingerprint") {
    // k=5, w=4 → any common substring of length >= 8 must contribute at
    // least one common selected hash (the MOSS guarantee)
    val common = "xqzwvkjh" // 8 chars, appears inside both docs
    val out = fps(
      1L -> s"prefix one $common suffix alpha",
      2L -> s"totally other lead-in $common and a different tail",
      3L -> "nothing in common with the others at all")
    assert(out(1L).toSet.intersect(out(2L).toSet).nonEmpty)
    assert(out(1L).toSet.intersect(out(3L).toSet).isEmpty)
  }

  test("winnowing: fingerprints are sorted, distinct, and case-insensitive") {
    val out = fps(1L -> "The Quick Brown Fox", 2L -> "the quick brown fox")
    assert(out(1L) === out(2L))
    assert(out(1L) === out(1L).distinct.sorted)
  }

  test("winnowing edge cases: sub-k text is empty, sub-window text keeps the global min") {
    val out = fps(1L -> "abc", 2L -> "abcdef", 3L -> "")
    assert(out(1L).isEmpty)  // 3 chars < k=5 → no grams
    assert(out(3L).isEmpty)
    // 6 chars → 2 grams < w=4 windows → exactly the global min survives
    assert(out(2L).size === 1)
  }

  test("winnowing: non-positive k or w fails at construction, not with garbage") {
    // w <= 0 would advance the deque head past the tail (stale-slot
    // reads); k <= 0 would throw deep inside MessageDigest.update
    intercept[IllegalArgumentException] {
      TextStats.winnowFingerprints(lit("some text"), k = 0, w = 4)
    }
    intercept[IllegalArgumentException] {
      TextStats.winnowFingerprints(lit("some text"), k = 5, w = 0)
    }
  }

  test("redact: urls first (inner digits not double-masked), emails, ip, phone, digit runs") {
    val out = Seq(
      (1L, "see https://x.org/a?id=123456789 or mail bob.smith+a@corp.example.io ref 00427711942"),
      (2L, "short 12345 stays, 123456 goes"),
      (3L, "nothing to scrub here"),
      (4L, "host 192.168.100.254 answered"),
      (5L, "call +1-555-012-3456 or (555) 987-6543 now"),
      (6L, "url with ip https://10.0.0.1/x stays one URL"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextStats.redact($"text").as("r"),
        TextStats.redactionCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) === ("see <URL> or mail <EMAIL> ref <NUM>", 3))
    assert(out(2L) === ("short 12345 stays, <NUM> goes", 1)) // 5 digits below threshold
    assert(out(3L) === ("nothing to scrub here", 0))
    assert(out(4L) === ("host <IP> answered", 1))
    assert(out(5L) === ("call <PHONE> or <PHONE> now", 2))
    assert(out(6L) === ("url with ip <URL> stays one URL", 1))
  }

  test("langId: argmax of stopword hits, fixed-order ties, und when zero") {
    val out = Seq(
      (1L, "the cat sat on the mat and a dog"),   // en
      (2L, "le chat est dans la maison et le jardin"), // fr
      (3L, "der hund ist in das haus und der garten"), // de
      (4L, "zzz qqq www"),                         // no hits → und
      (5L, "the le"),                              // 1-1 tie → en (fixed order)
      (6L, null: String))
      .toDF("doc_id", "text")
      .select($"doc_id", TextStats.langId(TextStats.tokens($"text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "fr", 3L -> "de",
      4L -> "und", 5L -> "en", 6L -> "und"))
  }

  test("langId plan: exactly one stopword filter walk per language") {
    // Interpreted HOFs get no subexpression elimination — the naive
    // when(s === greatest(...)) chain re-evaluated each language's
    // filter ~3×; the let-bound scores array keeps it at exactly 5.
    import org.apache.spark.sql.catalyst.expressions.ArrayFilter
    // spark.range (not a LocalRelation) so ConvertToLocalRelation can't
    // constant-fold the projection away before we inspect it
    val plan = spark.range(1)
      .select(concat(lit("the a of "), $"id".cast("string")).as("text"))
      .select(TextStats.langId(TextStats.tokens($"text")).as("lang"))
      .queryExecution.optimizedPlan
    val nFilters = plan.expressions.map(_.collect { case f: ArrayFilter => f }.size).sum
    assert(nFilters === TextStats.stopwords.size)
  }

  test("repetition: gram modes, tie-breaks, and caps on a hand fixture") {
    val docs = Seq(
      // 2-grams: "a b"×3, "b c"×2, "c a"×2 → mode "a b"; 5-grams:
      // [a b c a b][b c a b c][c a b c a][a b c a b] → 4 total,
      // 3 distinct → dup5 = 2500
      (1L, "a b c a b c a b"),
      (2L, "x y"),           // single 2-gram, count 1, no 5-grams
      (3L, "z"),             // no grams at all
      (4L, null: String))    // null text == empty doc
      .toDF("doc_id", "text")
    val out = TextStats.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[String]("top2_gram") === "a b")   // 3×, beats "b c" 2×
    assert(d1.getAs[Long]("top2_count") === 3L)
    // 3 occurrences × 3 chars / 15 chars = 0.6 → 6000
    assert(d1.getAs[Long]("top2_char_frac_q4") === 6000L)
    assert(d1.getAs[Long]("dup5_frac_q4") === 2500L)
    assert(d1.getAs[Long]("dup10_frac_q4") === 0L)
    val d2 = out(2L)
    assert(d2.getAs[String]("top2_gram") === "x y")
    assert(d2.getAs[Long]("top2_count") === 1L)
    assert(d2.getAs[Long]("dup5_frac_q4") === 0L)
    assert(out(3L).getAs[String]("top2_gram") === null)
    assert(out(3L).getAs[Long]("top2_count") === 0L)
    assert(out(4L).getAs[String]("top2_gram") === null)
    // all-equal tokens: every 2-gram identical, char coverage caps at 1
    val cap = TextStats.repetition(Seq((9L, "aa aa aa aa aa aa"))
      .toDF("doc_id", "text")).collect()(0)
    assert(cap.getAs[Long]("top2_char_frac_q4") === 10000L)
    // "a b a b a": 2-grams [a b][b a][a b][b a] tie 2-2 → the
    // lexicographically smaller gram must win deterministically
    val tie = TextStats.repetition(Seq((8L, "a b a b a"))
      .toDF("doc_id", "text")).collect()(0)
    assert(tie.getAs[String]("top2_gram") === "a b")
  }

  test("repetition plan: each gram mode is aggregated exactly once") {
    // The mode structs are stored columns consumed by several outputs;
    // CollapseProject must keep them materialized (non-cheap, multiple
    // refs) rather than inlining one run-length pass per consumer —
    // the same no-HOF-re-evaluation discipline langId pins above.
    import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
    val plan = TextStats.repetition(
      spark.range(1).select($"id".as("doc_id"),
        concat(lit("w x y z "), $"id".cast("string")).as("text")))
      .queryExecution.optimizedPlan
    val nAggs = plan.collect { case p =>
      p.expressions.map(_.collect { case a: ArrayAggregate => a }.size).sum
    }.sum
    assert(nAggs === 2) // one per mode (_t2, _t3)
  }

  test("lmScore: hand-computed conditional-probability quantization") {
    // doc 1 "x y x y": bigrams (x y)(y x)(x y); doc 2 "x z"; doc 3 empty
    // corpus counts: c2(x y)=2, c2(y x)=1, c2(x z)=1; c1(x·)=3, c1(y·)=1
    // q(x y) = 1e6·2 div 3 = 666666; q(y x) = 1000000; q(x z) = 333333
    val docs = Seq((1L, "x y x y"), (2L, "x z"), (3L, "")).toDF("doc_id", "text")
    val out = TextStats.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((3L, (666666L + 1000000L + 666666L) / 3)), // = 777777
      2L -> ((1L, 333333L)),
      3L -> ((0L, 0L))))
  }

  test("lmScore == naive driver reference on a randomized corpus") {
    val rnd = new scala.util.Random(99)
    val words = Seq("a", "b", "c", "dd", "ee")
    val docs = (1L to 120L).map { id =>
      val n = rnd.nextInt(8) // includes 0 and 1 (no bigrams)
      (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    def toks(t: String) = t.toLowerCase.split("\\s+").toSeq
    val bigrams = docs.flatMap { case (id, t) =>
      val w = toks(t)
      if (w.length >= 2) w.sliding(2).map(p => (id, p(0) + " " + p(1))).toSeq
      else Seq.empty
    }
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    val want = docs.map { case (id, _) =>
      val bs = bigrams.filter(_._1 == id).map(_._2)
      if (bs.isEmpty) id -> ((0L, 0L))
      else {
        val qs = bs.map(g => 1000000L * c2(g) / c1(g.split(" ")(0)))
        id -> ((bs.size.toLong, qs.sum / bs.size))
      }
    }.toMap
    val got = TextStats.lmScore(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("vocabPairs: count-desc gram-asc ranking with an exact cut") {
    val docs = Seq((1L, "b a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // pairs: (b a)x2 (a b)x2+1 (b c)x1 → a b:3, b a:2, a b? recount:
    // doc1 "b a b a b": (b a)(a b)(b a)(a b); doc2: (a b)(b c)
    // → "a b":3, "b a":2, "b c":1
    val out = TextStats.vocabPairs(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a b", 3L), ("b a", 2L)))
    // tie-break: equal counts rank lexicographically
    val tied = TextStats.vocabPairs(Seq((1L, "z y"), (2L, "a b")).toDF("doc_id", "text"), 1)
      .collect().map(_.getString(0))
    assert(tied.toSeq === Seq("a b"))
  }

  test("filterCorpus: each rule fires alone, reasons sort, clean doc keeps") {
    val clean = "the table value of a row and the part in a scan is " +
      "the value to hash and the agg of a row in the table"
    val docs = Seq(
      (1L, clean),                                  // passes every rule
      (2L, "too short here"),                       // < 15 tokens
      (3L, "le la de et un une est dans le la de et un une est dans"),
      (4L, clean + " " + ("rep rep rep rep rep " * 8).trim))
      .toDF("doc_id", "text")
    val out = TextStats.filterCorpus(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Boolean]("keep"),
        r.getSeq[String](r.fieldIndex("reasons")))).toMap
    assert(out(1L) === ((true, Seq.empty)))
    assert(out(2L)._1 === false && out(2L)._2.contains("too_short"))
    assert(out(3L)._2.contains("lang_mismatch")) // French stopwords
    assert(out(4L)._1 === false &&
      (out(4L)._2.contains("dup_ngrams") || out(4L)._2.contains("top_ngram")))
    // reasons arrive sorted (hash-stable across engines)
    out.values.foreach { case (_, rs) => assert(rs === rs.sorted) }
  }

  test("filterCorpus plan: a single narrow pass, no Exchange") {
    val plan = TextStats.filterCorpus(
      spark.range(3).select($"id".as("doc_id"),
        concat(lit("some text for doc "), $"id".cast("string")).as("text")))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      "corpus filtering must stay a scan-speed narrow pass")
  }

  test("classifierScore == independent md5 reimplementation; keep at midpoint") {
    // independent transcription of the model contract (NOT the kernel):
    // bucket = md5u32(token) % dim, weight = md5u32(str(bucket)) % 2001 - 1000
    def md5u32(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    }
    def expected(text: String, dim: Int): (Long, Long, Boolean) = {
      val toks = text.toLowerCase.split("\\s+", -1)
      val raw = toks.map(t => md5u32((md5u32(t) % dim).toString) % 2001 - 1000).sum
      val n = toks.length.toLong
      val bp = (10000L * (raw + 1000 * n)) / (2000 * n)
      (n, bp, bp >= 5000)
    }
    val texts = Seq("the quick brown fox", "spark scan merge join table row",
      "a", "  ", "δδδ mixed UNICODE Case")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextStats.classifierScore(docs, dim = 64).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === expected(t, 64), s"doc $i: '$t'")
    }
    // real corpus: both outcomes occur and scores stay in [0, 10000]
    val corpus = TextStats.classifierScore(
      Tables.load(spark, sfDir, "documents")).collect()
    assert(corpus.exists(_.getBoolean(3)) && corpus.exists(!_.getBoolean(3)))
    assert(corpus.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 10000))
  }

  test("classifierScore plan: narrow codegen pass, no join, no Exchange") {
    val df = TextStats.classifierScore(
      spark.range(3).select($"id".as("doc_id"),
        concat(lit("text for doc "), $"id".cast("string")).as("text")))
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      "model scoring must stay a scan-speed narrow pass")
    assert(plan.toString.contains("hashed_linear_score"))
  }

  test("chunkDocs: coverage, overlap, tail, and short-doc identity") {
    val words = (1 to 100).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),       // 100 tokens -> 3 chunks at 48/32
      (2L, "a b c"),                   // short: one chunk, itself
      (3L, words.take(48).mkString(" ")), // exactly size: one chunk
      (4L, words.take(49).mkString(" ")))  // size+1: two chunks
      .toDF("doc_id", "text")
    val out = TextStats.chunkDocs(docs, size = 48, stride = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keys.count(_._1 == 1L) === 3)
    assert(out((1L, 0L))._2 === words.slice(0, 48).mkString(" "))
    assert(out((1L, 1L))._2 === words.slice(32, 80).mkString(" "))
    assert(out((1L, 2L))._2 === words.slice(64, 100).mkString(" ")) // 36-token tail
    assert(out((1L, 2L))._1 === 36)
    assert(out((2L, 0L)) === ((3L, "a b c")) && !out.contains((2L, 1L)))
    assert(out.keys.count(_._1 == 3L) === 1)
    assert(out.keys.count(_._1 == 4L) === 2)
    // every token of doc 1 appears in some chunk (coverage)
    val covered = out.collect { case ((1L, _), (_, t)) => t.split(" ") }.flatten.toSet
    assert(covered === words.toSet)
  }

  test("skipgrams: exact windowed pair set on a hand doc; window=1 degrades to bigrams") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val w3 = TextStats.skipgrams(docs, window = 3, k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w3 === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    val w1 = TextStats.skipgrams(docs, window = 1, k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w1 === Set(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("skipgrams: counts accumulate across docs; minCount and top-k tie order hold") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("doc_id", "text")
    val out = TextStats.skipgrams(docs, window = 2, k = 5, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x", "y", 2L))) // (x,z) dies at minCount
  }

  test("collocations: lift ranks a planted sticky pair above frequent-but-independent") {
    // 'x y' always adjacent (perfect association); 'the'/'of' frequent but
    // independently placed -> high margins, low lift
    val docs = (1 to 30).map { i =>
      (i.toLong, s"x y the w$i of the q$i of x y w$i the of")
    }.toDF("doc_id", "text")
    val out = TextStats.collocations(docs, k = 10, minCount = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byG = out.map(t => t._1 -> t._3).toMap
    assert(byG.contains("x y"))
    // the perfectly-associated pair sits at the top; high-margin
    // independent words ('the' appears 3x/doc in varied contexts) rank
    // strictly below it
    assert(byG("x y") === out.map(_._3).max)
    out.filter(t => t._1.startsWith("the "))
      .foreach(t => assert(byG("x y") > t._3, s"x y should out-lift ${t._1}"))
    assert(out.exists(_._3 < byG("x y")), "some pair must rank strictly below")
    // descending lift with g tie-break
    assert(out.map(_._3).toSeq === out.map(_._3).sortBy(-_).toSeq)
  }

  test("pieces: alphanumeric runs + single symbols; CJK counts per character") {
    val out = Seq((1L, "Hello, world! it's 42"), (2L, "中文 文本"), (3L, null: String))
      .toDF("doc_id", "text")
      .select($"doc_id", TextStats.pieceCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // hello , world ! it ' s 42 → 8 pieces
    assert(out(1L) === 8)
    // each CJK char is its own piece: 中 文 文 本 → 4
    assert(out(2L) === 4)
    assert(out(3L) === 0)
  }

  test("mixKlDrift: identical-mix sources score exactly 0; drifted source is positive and exact") {
    // both sources have the corpus distribution -> p = q per term, every
    // contribution is floor(0) = 0 (no quantization shave on true zero)
    val same = Seq(("s1", "a b a c"), ("s2", "a b a c"))
      .toDF("source", "text")
    val kl0 = TextStats.mixKlDrift(same)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kl0 === Map("s1" -> 0L, "s2" -> 0L))

    // "skew" is all one token: p(a)=1, corpus q(a)=10/16 -> KL=ln(1.6)
    val docs = Seq(
      ("flat", "a b c d"), ("flat", "a b c d"),
      ("skew", "a a a a"), ("skew", "a a a a"))
      .toDF("source", "text")
    val out = TextStats.mixKlDrift(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("skew") ===
      math.floor(1.0 * math.log(1.0 / (10.0 / 16.0)) * 1e8).toLong)
    // KL >= 0 up to < 1 q8 unit shave per term; flat (4 terms) bounded below
    assert(out("flat") >= -4L && out("skew") > out("flat"),
      s"flat=${out("flat")} skew=${out("skew")}")
  }

  test("ngramNovelty: unique doc 10000 bp, duplicated text 0 bp, short doc 0 grams") {
    val docs = Seq(
      (1L, "u1 u2 u3 u4 u5"), // all grams exclusive
      (2L, "c1 c2 c3 c4"), // duplicated in doc 3 -> both fully non-novel
      (3L, "c1 c2 c3 c4"),
      (4L, "s1 s2")) // too short for a 3-gram
      .toDF("doc_id", "text")
    val out = TextStats.ngramNovelty(docs, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 3L, 10000L)))
    assert(out(2L) === ((2L, 0L, 0L)))
    assert(out(3L) === ((2L, 0L, 0L)))
    assert(out(4L) === ((0L, 0L, 0L)))
  }

  test("ngramNovelty: a gram repeated only WITHIN one doc stays exclusive") {
    val docs = Seq(
      (1L, "x y z x y z"), // "x y z" occurs twice, but only in doc 1
      (2L, "p q r s"))
      .toDF("doc_id", "text")
    val out = TextStats.ngramNovelty(docs, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 10000L)
  }

  test("termDrift: planted emerging term tops the ranking; top-k plans as TakeOrdered") {
    val docs = Seq(
      (1L, "stable stable stable filler"),
      (2L, "stable stable stable newterm newterm newterm"))
      .toDF("doc_id", "text")
    // snapshot 1 = doc_id % 2 == 0 -> doc 2; snapshot 2 -> doc 1
    val df = graft.ext.TextStats.termDrift(docs, col("doc_id") % 2 === 0, k = 3)
    val out = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // newterm: early 3/6=5000bp, late 0 -> delta -5000
    assert(out("newterm") === ((5000L, 0L, -5000L)))
    // filler: early 0, late 1/4=2500bp -> delta +2500
    assert(out("filler") === ((0L, 2500L, 2500L)))
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("lmScoreBackoff: seen path, unigram backoff, double-unseen zero, short doc kept") {
    val docs = Seq(
      (1L, "en", "a b a b"),  // train: c2(a b)=2, c2(b a)=1; c1(a)=2, c1(b)=1; N=4
      (2L, "fr", "z a"),      // unseen bigram, seen continuation -> 400000*2/4
      (3L, "fr", "z q"),      // both unseen -> 0
      (4L, "fr", "a"))        // no bigrams -> zeros
      .toDF("doc_id", "lang", "text")
    val out = graft.ext.TextStats.lmScoreBackoff(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 0L, 1000000L))) // every train bigram has p=1
    assert(out(2L) === ((1L, 1L, 200000L)))
    assert(out(3L) === ((1L, 1L, 0L)))
    assert(out(4L) === ((0L, 0L, 0L)))
  }

  test("charDiversity: hand-computed shares and collision probabilities, empty/null rows kept") {
    val docs = Seq(
      (1L, "aaa"),            // one char: top 10000, simpson 10000
      (2L, "abab"),           // c=(2,2): top 5000, simpson 4/12 -> 3333
      (3L, "abcd"),           // all distinct: simpson 0, top 2500
      (4L, ""),               // empty -> all zeros
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.ext.TextStats.charDiversity(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((3L, 1L, 10000L, 10000L)))
    assert(out(2L) === ((4L, 2L, 5000L, 3333L)))
    assert(out(3L) === ((4L, 4L, 2500L, 0L)))
    assert(out(4L) === ((0L, 0L, 0L, 0L)))
    assert(out(5L) === ((0L, 0L, 0L, 0L)))
  }

  test("mixedLanguage: majority share, tie-break, und for empty docs") {
    import spark.implicits._
    // chunkSize 4: doc 1 = two en chunks; doc 2 = one en + one fr chunk
    // (50% share -> mixed at the 80% default); doc 3 empty -> 1 und chunk
    val docs = Seq(
      (1L, "the a of and the a of and"),
      (2L, "the a of and le la de et"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextStats.mixedLanguage(docs, chunkSize = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(out(1L) === ((2L, 1L, "en", 10000L, false)))
    assert(out(2L) === ((2L, 2L, "en", 5000L, true))) // tie: en < fr
    assert(out(3L) === ((1L, 1L, "und", 10000L, false)))
  }

  test("extractSpans: typed spans with in-kind ordinals, cascade-shielded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "visit https://x.co/a mail a.b@c.org then d@e.fr " +
        "from 10.0.0.1 call 555-123-4567 ref 1234567"),
      // digits inside the URL are the URL's, not a <NUM> span
      (2L, "see https://x.co/123456789 ref 654321"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = TextStats.extractSpans(docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out === Set(
      (1L, "<URL>", 1L, "https://x.co/a"),
      (1L, "<EMAIL>", 1L, "a.b@c.org"),
      (1L, "<EMAIL>", 2L, "d@e.fr"),
      (1L, "<IP>", 1L, "10.0.0.1"),
      (1L, "<PHONE>", 1L, "555-123-4567"),
      (1L, "<NUM>", 1L, "1234567"),
      (2L, "<URL>", 1L, "https://x.co/123456789"),
      (2L, "<NUM>", 1L, "654321")))
  }

  test("sourceCosine: identical distributions score 10000, disjoint " +
      "vocabularies emit NO pair row, mixtures land between") {
    val docs = Seq(
      ("A", "a a b"), ("B", "a a b"),      // identical share vectors
      ("C", "c c c"),                      // disjoint from A/B
      ("D", "a b c")                       // overlaps everything
    ).toDF("source", "text")
    val out = TextStats.sourceCosine(docs)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("A", "B")) === ((2L, 10000L)))
    assert(!out.contains(("A", "C"))) // no shared term -> cos = 0, absent
    val (nAD, cosAD) = out(("A", "D"))
    assert(nAD === 2L && cosAD > 0L && cosAD < 10000L)
  }

  test("keyness: source-exclusive term tops its source; minCount " +
      "suppresses rare terms; ties break lexicographically") {
    val docs = Seq(
      // 'zebra' x5 only in A (passes minCount=5); 'rare' x4 filtered
      ("A", "zebra zebra zebra zebra zebra rare rare rare rare"),
      ("B", "common common common common common common common common common"),
      ("A", "common common common common common common common common common"))
      .toDF("source", "text")
    val out = TextStats.keyness(docs, k = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val aTop = out.filter(_._1 == "A").sortBy(_._2).map(_._3)
    assert(aTop.head === "zebra")
    assert(!out.exists(_._3 == "rare"))
  }

  test("lengthProfile: bit-length buckets with the empty doc in bucket 0") {
    val docs = Seq(
      ("S", ""),                    // 0 tokens  -> bucket 0
      ("S", "a"),                   // 1 token   -> bucket 1
      ("S", "a b"), ("S", "a b c"), // 2,3       -> bucket 2
      ("S", "a b c d"),             // 4         -> bucket 3
      ("S", "a b c d e f g h")      // 8         -> bucket 4
    ).toDF("source", "text")
    val out = TextStats.lengthProfile(docs)
      .collect().map(r => (r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(0L) === ((1L, 0L, 0L, 0L)))
    assert(out(1L) === ((1L, 1L, 1L, 1L)))
    assert(out(2L) === ((2L, 5L, 2L, 3L)))
    assert(out(3L) === ((1L, 4L, 4L, 4L)))
    assert(out(4L) === ((1L, 8L, 8L, 8L)))
  }

  test("readability: hand-computed Flesch c100, vowelless correction, sentence fallback") {
    import spark.implicits._
    val docs = Seq(
      // w=6, s=2, vowel runs=6 → 20684 − (203·6 div 4) − (8460·6 div 6)
      (1L, "The cat sat. The dog ran!"),
      // no vowels at all: syl = vowelless correction = w = 2; no
      // terminator → sentence count falls back to 1
      (2L, "bcd fgh"),
      (3L, "") // w counts the empty token; flesch still defined
    ).toDF("doc_id", "text")
    val out = TextStats.readability(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))).toMap
    assert(out(1L) === ((6L, 2L, 6L, 20684L - 304L - 8460L)))
    assert(out(2L) === ((2L, 1L, 2L, 20684L - 203L - 8460L)))
    // "" splits to one empty token (the tokenizer's documented shape):
    // w=1, the empty token is vowelless → syl=1
    assert(out(3L) === ((1L, 1L, 1L, 20684L - 101L - 8460L)))
  }
}
