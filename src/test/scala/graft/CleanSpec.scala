package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Redact, Sampling, Similarity, TextOps}

/** Specs for the text-cleaning / curation operators (CleanQueries):
  * NFC normalization, PII scrubbing, bigram-LM scoring, quantile
  * binning, and the k-NN self-join. Unicode literals are written as
  * escape sequences so source encoding can never silently re-compose
  * the decomposed fixtures.
  */
class CleanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("4")
  import spark.implicits._

  // --- Html extraction --------------------------------------------

  test("Html.extractText drops head/script/style/comments, breaks blocks, decodes entities") {
    import graft.operators.Html
    val page = "<html><head><title>T</title><style>p{}</style></head>" +
      "<body><script>var x='<p>';</script><h1>Head</h1>" +
      "<p>one&nbsp;&amp;\n  two</p><div>three &lt;tag&gt; &#39;q&#39;</div>" +
      "<header>kept</header><!-- gone --><ul><li>item</li></ul></body></html>"
    val out = Seq(page).toDF("h")
      .select(Html.extractText(col("h")).as("t"),
        Html.title(col("h")).as("title"))
      .head()
    // head dropped (title text NOT in body), <header> content kept,
    // script body (with its embedded '<p>') dropped, entities decoded
    assert(out.getString(0) == "Head one & two three <tag> 'q' kept item")
    assert(out.getString(1) == "T")
    // block boundaries never fuse words: attributed <br>, table cells,
    // and implied-closer <p> all break (each was a found bug class)
    val fuse = Seq("one<br class=\"clear\">two",
      "<table><tr><td>Price</td><td>100</td></tr></table>",
      "<p>one<p>two").toDF("h")
      .select(Html.extractText(col("h"))).as[String].collect().toSeq
    assert(fuse == Seq("one two", "Price 100", "one two"), fuse.toString)
  }

  test("Html.anchorChars/linkDensity/textRatio: anchor text counted, bounds hold") {
    import graft.operators.Html
    val page = "<body><p>words here</p>" +
      "<a href='/x'>link <b>one</b></a><a>two</a><p>tail</p></body>"
    val r = Seq(page, "<p>no links at all</p>", "").toDF("h")
      .select(Html.anchorChars(col("h")).as("a"),
        Html.linkDensity(col("h")).as("d"),
        Html.textRatio(col("h")).as("r"))
      .collect()
    assert(r(0).getLong(0) == "link one".length + "two".length)
    assert(r(0).getDouble(1) > 0 && r(0).getDouble(1) < 1)
    assert(r(1).getLong(0) == 0L && r(1).getDouble(1) == 0.0)
    assert(r(2).getLong(0) == 0L && r(2).getDouble(2) == 0.0)
    // text_ratio of a markup-free string is 1.0
    val plain = Seq("just prose").toDF("h")
      .select(Html.textRatio(col("h"))).head().getDouble(0)
    assert(plain == 1.0)
  }

  test("Html entity decode order: &amp;lt; stays a literal '&lt;' after decode") {
    import graft.operators.Html
    // the page ESCAPED '&lt;' as '&amp;lt;' — decoding &amp; last must
    // yield the text '&lt;', never a second-round '<'
    val out = Seq("<p>&amp;lt;</p>").toDF("h")
      .select(Html.extractText(col("h"))).head().getString(0)
    assert(out == "&lt;")
  }

  // --- C4 line filter ---------------------------------------------

  test("c4KeepLine: punctuation/min-words/blocklist rules, line accounting") {
    val cases = Seq(
      ("A proper sentence with words.", true),
      ("Is this kept as well?", true),
      ("he said \"stop.\"", true),         // closing quote after punct
      ("no terminal punctuation", false),
      ("Too few.", false),                  // < 3 words
      ("Click here to enable JavaScript.", false),
      ("if (x) { return y; }", false),      // brace + no terminal punct
      ("Lorem Ipsum is filler text.", false),
      ("   ", false))
    val got = cases.map(_._1).toDF("l")
      .select(graft.operators.TextOps.c4KeepLine(col("l")).as("k"))
      .as[Boolean].collect().toSeq
    assert(got == cases.map(_._2), cases.map(_._1).zip(got).mkString("; "))

    val doc = "Keep this first sentence.\nnot this\nNor this one {x}.\nFinal line stays here."
    val (clean, nl, nk) = graft.operators.TextOps.c4LineClean(lit(doc))
    val r = spark.range(1).select(clean.as("c"), nl.as("l"), nk.as("k")).head()
    assert(r.getString(0) == "Keep this first sentence.\nFinal line stays here.")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
  }

  // --- Line repetition --------------------------------------------

  test("lineRepetition: repeats counted as n minus distinct, char-weighted") {
    val doc = "aa.\nbb.\naa.\ncc."          // 4 lines, 'aa.' repeated once
    val (n, f, cf) = graft.operators.TextOps.lineRepetition(lit(doc))
    val r = spark.range(1).select(n.as("n"), f.as("f"), cf.as("cf")).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.25)           // 1 repeat / 4 lines
    assert(r.getDouble(2) == 3.0 / 12.0)     // 3 repeat chars / 12 total
    // no repeats and the empty doc are both 0, not NaN/error
    val (n2, f2, cf2) = graft.operators.TextOps.lineRepetition(lit("x.\ny."))
    val r2 = spark.range(1).select(n2, f2.as("f"), cf2.as("cf")).head()
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(2) == 0.0)
    val (_, f3, cf3) = graft.operators.TextOps.lineRepetition(lit(""))
    val r3 = spark.range(1).select(f3.as("f"), cf3.as("cf")).head()
    assert(r3.getDouble(0) == 0.0 && r3.getDouble(1) == 0.0)
  }

  // --- NfcNormalize expression ------------------------------------

  test("NfcNormalize: codegen and interpreted agree; composes NFD sequences") {
    val decomposed = "cafe\u0301"     // e + combining acute
    val composed = "caf\u00e9"
    val df = Seq(
      decomposed,
      composed,                       // already NFC: fast path, unchanged
      "A\u030a",                      // decomposed A-ring
      "plain ascii", "").toDF("s")
    val viaExpr = df.select(
      graft.functions.TextExpressions.nfc_normalize(col("s")).as("n"))
      .as[String].collect().toSeq
    val viaJava = df.as[String].collect().toSeq
      .map(s => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(viaExpr == viaJava)
    assert(viaExpr(0) == composed && viaExpr(1) == composed)
    assert(viaExpr(2) == "\u00c5")
    // interpreted eval through the expression directly
    val e = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == composed)
    assert(graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("WordTokens kernel == declarative filter(split) on varied text") {
    val df = Seq(
      "the quick  brown\tfox", "  leading ws", "trailing ws   ",
      "\t\n mixed \r\n ws ", "single", "", "   ", "a b c d e f g",
      null.asInstanceOf[String]).toDF("s")
    val kern = df.select(
      graft.functions.TextExpressions.word_tokens(col("s")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    val hof = df.select(
      filter(split(col("s"), "\\s+"), w => w =!= "").as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(kern.toSeq == hof.toSeq)
    // interpreted eval path agrees too (null in -> null out)
    val e = graft.functions.WordTokens(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(" a  b\tc "),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq ==
      Seq("a", "b", "c"))
    assert(graft.functions.WordTokens(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("WordShingles kernel == declarative transform/slice composition") {
    val df = Seq(
      "the quick brown fox jumps", "one two three", "one two", "one",
      "  padded   tokens  here now ", "", null.asInstanceOf[String]).toDF("s")
    for (k <- Seq(1, 2, 3)) {
      val toks = filter(split(col("s"), "\\s+"), w => w =!= "")
      val declarative = when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " ")))
        .otherwise(array().cast("array<string>"))
      val a = df.select(
        graft.functions.TextExpressions.word_shingles(col("s"), k).as("sh"))
        .collect().map(_.getSeq[String](0))
      val b = df.select(declarative.as("sh")).collect().map(_.getSeq[String](0))
      assert(a.toSeq == b.toSeq, s"k=$k")
    }
    // null text -> EMPTY array (the original when().otherwise contract)
    val e = graft.functions.WordShingles(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(3))
    assert(e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("nearest_cell_ids == transform(nearest_cells, element_at) mapping") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 60).map(i =>
      (i.toLong + 100, Array.fill(16)(rnd.nextDouble() - 0.5)))
    val df = vecs.toDF("id", "v")
    val cb = vecs.take(8).map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(_ / n))
    }
    val ids = typedLit(cb.map(_._1))
    for (rep <- Seq(1, 3)) {
      val fused = df.select(col("id"),
        graft.functions.VectorExpressions.nearest_cell_ids(
          col("v"), cb.map(_._2.toSeq), cb.map(_._1), rep).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      val viaHof = df.select(col("id"),
        transform(graft.functions.VectorExpressions.nearest_cells(
          col("v"), cb.map(_._2.toSeq), rep), i => element_at(ids, i + 1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      assert(fused.toSeq == viaHof.toSeq, s"rep=$rep")
    }
  }

  test("TextOps.normalizeText: NFC + lower + whitespace collapse + trim") {
    val df = Seq("  HE\u0301LLO   World\t\nx  ").toDF("s")
    val out = df.select(TextOps.normalizeText(col("s")).as("n"))
      .as[String].head()
    assert(out == "h\u00e9llo world x")
  }

  // --- script profile ----------------------------------------------

  test("TextOps.scriptProfile counts scripts on a known mixed string") {
    // "ab1 <privet> <nihao> !" with Cyrillic privet (6) and CJK nihao (2)
    val s = "ab1 \u043f\u0440\u0438\u0432\u0435\u0442 \u4f60\u597d !"
    val out = TextOps.scriptProfile(Seq((1L, s)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    val m = out.schema.fieldNames.zip(out.toSeq).toMap
    assert(m("n_latin") == 2L && m("n_digit") == 1L)
    assert(m("n_cyrillic") == 6L && m("n_cjk") == 2L)
    assert(m("n_space") == 3L && m("n_chars") == 15L && m("n_other") == 1L)
  }

  // --- URL canonicalization ----------------------------------------

  test("Urls.canonicalize: case-folds authority, strips default ports, tracking, fragments") {
    import graft.operators.Urls
    val cases = Seq(
      "HTTP://Example.COM:80/Path/File?id=1" -> "http://example.com/Path/File?id=1",
      "https://CDN.Example.com:443/img.png#frag" -> "https://cdn.example.com/img.png",
      "http://a.com:8080/x" -> "http://a.com:8080/x",          // non-default port kept
      "https://a.com:80/x" -> "https://a.com:80/x",            // scheme-mismatched port kept
      "http://a.com/p?utm_source=x" -> "http://a.com/p",
      "http://a.com/p?utm_source=x&q=2&fbclid=z" -> "http://a.com/p?q=2",
      "http://a.com/p?q=1&utm_a=x&utm_b=y&r=2" -> "http://a.com/p?q=1&r=2",
      "http://a.com/p?gclid=1#sec" -> "http://a.com/p")
    val got = cases.map(_._1).toDF("u")
      .select(Urls.canonicalize(col("u")).as("c")).as[String].collect().toSeq
    cases.map(_._2).zip(got).foreach { case (want, have) =>
      assert(have == want, s"expected $want, got $have")
    }
    // extraction finds every absolute URL in running text
    val urls = Seq("see http://a.b/c and https://d.e/f done").toDF("t")
      .select(explode(Urls.extract(col("t"))).as("u")).as[String].collect().toSeq
    assert(urls == Seq("http://a.b/c", "https://d.e/f"))
  }

  // --- DeflatedSize / compression ratio ----------------------------

  test("DeflatedSize: codegen and interpreted agree; null passes through") {
    val ss = Seq("abcabcabcabcabcabcabcabc", "the quick brown fox", "")
    val viaExpr = ss.toDF("s")
      .select(graft.functions.CompressExpressions.deflated_size(col("s")).as("n"))
      .as[Int].collect().toSeq
    val viaUtil = ss.map(s =>
      graft.functions.CompressUtil.deflatedSize(s.getBytes("UTF-8")))
    assert(viaExpr == viaUtil)
    val e = graft.functions.DeflatedSize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(ss.head),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == viaUtil.head)
    assert(graft.functions.DeflatedSize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("compressionRatio: repetitive < prose < noise; empty is NULL; big values survive") {
    val repetitive = "buy now click here " * 200
    val prose = ("the committee considered several proposals before " +
      "reaching a decision on the matter of local governance ") * 20
    // deterministic pseudo-noise (LCG over printable ASCII)
    val noise = {
      var x = 123456789L
      val sb = new StringBuilder
      (1 to 3800).foreach { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append((33 + Math.floorMod(x >>> 33, 94L)).toChar)
      }
      sb.toString
    }
    val rows = Seq(("rep", repetitive), ("prose", prose), ("noise", noise), ("empty", ""))
      .toDF("k", "s")
      .select(col("k"), TextOps.compressionRatio(col("s")).as("r"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(rows("empty").isEmpty)
    assert(rows("rep").get < rows("prose").get,
      "boilerplate must compress below prose")
    assert(rows("prose").get < rows("noise").get,
      "noise must compress above prose")
    assert(rows("rep").get < 0.1 && rows("noise").get > 0.8)
    // a value larger than the 64 KB scratch buffer still sizes
    // correctly (fresh noise — repeating a block would compress)
    val big = {
      var x = 987654321L
      val sb = new StringBuilder
      (1 to 150000).foreach { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append((33 + Math.floorMod(x >>> 33, 94L)).toChar)
      }
      sb.toString
    }
    val n = graft.functions.CompressUtil.deflatedSize(big.getBytes("UTF-8"))
    assert(n > big.length / 2 && n < big.length + 1024)
  }

  // --- PII scrub ----------------------------------------------------

  test("Redact.scrubPii: finds and replaces emails, phones, IPv4") {
    val s = "mail a.b+c@foo-bar.example.com or call 555-012-3456; " +
      "host 192.168.1.255 end"
    val df = Seq(s).toDF("t")
    val out = df.select(Redact.scrubPii(col("t")).as("c")).as[String].head()
    assert(out == "mail <EMAIL> or call <PHONE>; host <IP> end")
    val counts = df.select(
      Redact.matchCount(col("t"), Redact.EmailPattern).as("e"),
      Redact.matchCount(col("t"), Redact.PhonePattern).as("p"),
      Redact.matchCount(col("t"), Redact.Ipv4Pattern).as("i"))
      .as[(Long, Long, Long)].head()
    assert(counts == ((1L, 1L, 1L)))
  }

  test("Redact.scrubPii: no false positives on clean text") {
    val clean = Seq(
      "version 1.2 of the spec",      // not a dotted quad
      "meeting at 5.30 pm",
      "user at example dot com",
      "sum 100-200-300").toDF("t")    // wrong phone shape (3-3-3)
    val out = clean.select(Redact.scrubPii(col("t")).as("c"))
      .as[String].collect()
    assert(out.toSeq == clean.as[String].collect().toSeq)
  }

  // --- bigram LM ----------------------------------------------------

  test("TextOps.bigrams: adjacent pairs; empty/single-token arrays emit none") {
    val df = Seq("a b c a b", "solo", "").toDF("text")
    val bg = df.select(explode(TextOps.bigrams(
        graft.operators.Dedup.tokens(col("text")))).as("b"))
      .select("b.w1", "b.w2").as[(String, String)].collect().toSeq
    assert(bg == Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "b")))
  }

  test("TextOps.lmScore: per-doc bigram frequency stats") {
    val df = Seq((1L, "a b c"), (2L, "a b a b"), (3L, "x")).toDF("doc_id", "text")
    // corpus bigrams: (a,b)x3 [doc1 + doc2 twice], (b,c)x1, (b,a)x1
    val r = TextOps.lmScore(df, "doc_id", "text", rareCap = 1L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc1: bigrams (a,b)c12=3, (b,c)c12=1 -> n=2, rare=1, mean=2.0
    // doc2: (a,b)=3, (b,a)=1, (a,b)=3     -> n=3, rare=1, mean=7/3
    // doc3: no bigrams -> absent
    assert(r == Seq((1L, 2L, 1L, 2.0), (2L, 3L, 1L, 7.0 / 3)))
  }

  test("TextOps.perplexity matches a locally computed add-one bigram LM") {
    val rows = Seq((1L, "a b c a"), (2L, "b c b"), (3L, "c a c"))
    val df = rows.toDF("doc_id", "text")
    val got = TextOps.perplexity(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // local reference
    val docs = rows.map { case (id, t) => id -> t.split(" ").toSeq }
    val bigrams = docs.flatMap { case (id, t) => t.zip(t.tail).map((id, _)) }
    val c12 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = c1.size
    val want = docs.map { case (id, t) =>
      val bs = t.zip(t.tail)
      val ll = bs.map(b => math.log((c12(b) + 1.0) / (c1(b._1) + v))).sum
      id -> math.exp(-ll / bs.size)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, p) => assert(math.abs(p - want(id)) < 1e-9,
      s"doc $id: got $p want ${want(id)}") }
  }

  // --- BPE ----------------------------------------------------------

  test("Bpe.trainLocal: merges match hand-computed BPE on a known table") {
    // words: "low" x5, "lower" x2, "newest" x6, "widest" x3
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = graft.operators.Bpe.trainLocal(freqs, nMerges = 4)
    // classic example (Sennrich et al. fixture): es(9) -> est(9) ->
    // est</w>(9) -> lo(7)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", graft.operators.Bpe.EndMark),
      ("l", "o")))
  }

  test("Bpe.encodeWord: reconstruction round-trip and rank-order apply") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", graft.operators.Bpe.EndMark),
      ("l", "o"))
    val ranks = merges.zipWithIndex.toMap
    val enc = graft.operators.Bpe.encodeWord("lowest", ranks)
    assert(enc == Vector("lo", "w", "est</w>"))
    // concatenating subwords (minus the end mark) reconstructs the word
    assert(enc.mkString.stripSuffix(graft.operators.Bpe.EndMark) == "lowest")
  }

  test("Bpe.tokenize: distributed apply agrees with local encode; more merges never add tokens") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
      .persist()
    val m20 = graft.operators.Bpe.train(docs, "text", nMerges = 20)
    val m40 = graft.operators.Bpe.train(docs, "text", nMerges = 40)
    assert(m40.take(m20.size) == m20, "merge list must be a stable prefix")
    val ranks = m20.zipWithIndex.toMap
    val row = graft.operators.Bpe.tokenize(docs, "text", m20)
      .select(col("text"), col("bpe_tokens")).head()
    val localEnc = graft.operators.Dedup.tokensLocal(row.getString(0))
      .flatMap(w => graft.operators.Bpe.encodeWord(w, ranks))
    assert(row.getSeq[String](1) == localEnc)
    val tot20 = graft.operators.Bpe.tokenize(docs, "text", m20)
      .agg(sum(size(col("bpe_tokens")))).as[Long].head()
    val tot40 = graft.operators.Bpe.tokenize(docs, "text", m40)
      .agg(sum(size(col("bpe_tokens")))).as[Long].head()
    assert(tot40 <= tot20)
    docs.unpersist()
  }

  // --- quantile bins ------------------------------------------------

  test("Sampling.quantileBins: equal-count deciles, nulls get null bins") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (101L, Option.empty[Double])).toDF("id", "v")
    val binned = Sampling.quantileBins(df, "v", 10)
    val sizes = binned.filter(col("bin").isNotNull)
      .groupBy("bin").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (1 to 10).toSet)
    assert(sizes.values.forall(_ == 10L), s"unbalanced deciles: $sizes")
    assert(binned.filter(col("id") === 101L).select("bin").head().isNullAt(0))
    // monotone: higher value never gets a lower bin
    val rows = binned.filter(col("bin").isNotNull)
      .select(col("v"), col("bin")).as[(Double, Int)].collect().sortBy(_._1)
    assert(rows.map(_._2).sliding(2).forall(w => w(0) <= w(1)))
  }

  // --- knn join -----------------------------------------------------

  test("Similarity.knnJoinLsh: declared-query config recall >= 0.9 vs brute force") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val knn = Similarity.knnJoinLsh(emb, "vec_id", "embedding",
        k = 5, rep = 2, tables = 6)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    val knnSet = knn.toSet
    val recall = bf.intersect(knnSet).size.toDouble / bf.size
    assert(recall >= 0.9, s"knn recall $recall too low (${bf.size} truth pairs)")
    // at most k neighbors per query
    val maxPerQ = knn.groupBy(_._1).values.map(_.size).max
    assert(maxPerQ <= 5)
  }

  test("LSH cell cap bounds candidates on a duplicate-heavy embedding table") {
    // baseline for the leak assertion below (suites run sequentially;
    // earlier suites legitimately leave query-lifetime persists behind)
    spark.catalog.clearCache()
    // 400 copies of one vector + 40 distinct vectors: uncapped, the
    // dup cells emit O(400²) candidate rows; the cap drops those cells
    val dim = 8
    val rows = (0 until 400).map(i => (i.toLong, Seq.fill(dim)(1.0f))) ++
      (0 until 40).map(i => (400L + i, (0 until dim).map(d =>
        math.sin(i * dim + d).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val uncapped = Similarity.knnJoinLsh(df, "vec_id", "embedding",
      k = 3, nCells = 16, rep = 2, tables = 3)
    val capped = Similarity.knnJoinLsh(df, "vec_id", "embedding",
      k = 3, nCells = 16, rep = 2, tables = 3, maxBucket = 100)
    // capped output loses the dup cluster's internal pairs but keeps
    // neighbors among the well-spread minority
    assert(capped.count() < uncapped.count())
    assert(capped.filter(col("q_id") >= 400).count() > 0,
      "cap should keep the non-dup vectors' neighbor lists")
    // pair version: capped candidate volume stays near the distinct-
    // vector scale instead of the dups² scale
    val cappedPairs = Similarity.cosinePairsLsh(df, "vec_id", "embedding",
      threshold = 0.99, nCells = 16, rep = 2, tables = 3, maxBucket = 100)
    assert(cappedPairs.count() < 2000,
      "capped pair candidates should not blow up on the dup cluster")
    // the cap's internal persist is released before the operator
    // returns (repeated capped calls in a long session must not
    // accumulate cache entries)
    assert(spark.sharedState.cacheManager.isEmpty,
      "capped LSH call leaked a cached assignment table")
  }

  // --- Classify: contrastive token classifier ----------------------

  test("Classify: weights and scores match the hand-computed oracle") {
    import graft.operators.Classify
    // N_pos = 2 (docs 1,2), N_neg = 2 (docs 3,4)
    // df_pos: good=2 fine=1 bad=1 ; df_neg: bad=1 awful=2 fine=1
    // w = df_pos*2 - df_neg*2: good=4 fine=0 bad=0 awful=-4
    val docs = Seq(
      (1L, "good fine good", true),
      (2L, "good bad", true),
      (3L, "bad awful", false),
      (4L, "fine awful awful", false)).toDF("doc_id", "text", "y")
    val w = Classify.trainTokenWeights(docs, "doc_id", "text", col("y"))
    val wm = w.collect().map(r => r.getString(0) -> r.getDecimal(1).longValueExact()).toMap
    assert(wm == Map("good" -> 4L, "fine" -> 0L, "bad" -> 0L, "awful" -> -4L))
    val scored = Classify.scoreDocs(docs, "doc_id", "text", w)
    val sm = scored.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2).toLong,
        r.getLong(3)))).toMap
    assert(sm == Map(
      1L -> ((2L, 4L, 1L)), 2L -> ((2L, 4L, 1L)),
      3L -> ((2L, -4L, 0L)), 4L -> ((2L, -4L, 0L))))
    // the weight table reaches the scorer as a broadcast join — the
    // feature stream must never shuffle on the join key
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "weights should broadcast to the scorer")
  }

  test("Classify: hashing trick collapses colliding features once per doc") {
    import graft.operators.Classify
    val docs = Seq(
      (1L, "alpha beta", true),
      (2L, "gamma delta", false)).toDF("doc_id", "text", "y")
    // one bucket: every token maps to feature "0", counted ONCE per doc,
    // so df_pos = df_neg = 1 and every weight/score is exactly 0
    val w = Classify.trainTokenWeights(docs, "doc_id", "text", col("y"),
      hashBuckets = 1)
    assert(w.collect().map(r => (r.getString(0), r.getDecimal(1).longValueExact()))
      .toSeq == Seq(("0", 0L)))
    val sm = Classify.scoreDocs(docs, "doc_id", "text", w, hashBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).toLong, r.getLong(3))).toSet
    assert(sm == Set((1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L)))
  }

  test("Classify.evaluate: exact ppm metrics, NULL for undefined ratios") {
    import graft.operators.Classify
    // tp=3 fp=1 fn=2 tn=4: precision 3/4, recall 3/5, f1 6/9, acc 7/10
    val lab = (Seq.fill(3)((1L, 1L)) ++ Seq((0L, 1L)) ++
      Seq.fill(2)((1L, 0L)) ++ Seq.fill(4)((0L, 0L))).toDF("y", "pred")
    val r = Classify.evaluate(lab, col("y"), col("pred")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1L, 2L, 4L)))
    assert(r.getLong(4) == 750000L, "precision_ppm")
    assert(r.getLong(5) == 600000L, "recall_ppm")
    assert(r.getLong(6) == 666666L, "f1_ppm truncates, never rounds up")
    assert(r.getLong(7) == 700000L, "accuracy_ppm")
    // degenerate: no positive predictions and no positive labels ->
    // precision/recall/f1 are NULL, accuracy still defined
    val neg = Seq((0L, 0L), (0L, 0L)).toDF("y", "pred")
    val n = Classify.evaluate(neg, col("y"), col("pred")).collect()(0)
    assert(n.isNullAt(4) && n.isNullAt(5) && n.isNullAt(6))
    assert(n.getLong(7) == 1000000L)
  }

  // --- DSIR importance resampling ---------------------------------

  test("Dsir: target == raw makes every λ and every weight exactly 0") {
    import graft.operators.Dsir
    val d = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"),
      (3L, "")).toDF("doc_id", "text")
    val lam = Dsir.logRatios(d, d, "text", b = 64)
    assert(lam.forall(_ == 0L), s"nonzero λ for identical corpora: ${lam.toSeq.filter(_ != 0)}")
    val w = Dsir.importanceWeights(d, "doc_id", "text", lam, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(w.map(_._3).forall(_ == 0L))
    assert(w.find(_._1 == 3L).get._2 == 0L, "empty doc must report 0 tokens")
  }

  test("Dsir: NULL text scores like empty text (0 tokens, 0 weight, row kept)") {
    import graft.operators.Dsir
    val d = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val lam = Dsir.logRatios(d, d.filter(col("doc_id") === 1), "text", 32)
    val byId = Dsir.importanceWeights(d, "doc_id", "text", lam, 32).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(2L) == ((0L, 0L)), s"null-text doc scored ${byId(2L)}")
    assert(byId.contains(1L))
  }

  test("Dsir separates a target vocabulary from an off-target one") {
    import graft.operators.Dsir
    // two disjoint vocabularies; target = the 'good' docs
    val raw = ((1L to 10L).map(i => (i, "good fine nice words here")) ++
      (11L to 20L).map(i => (i, "spam junk noise garbage stuff"))).toDF("doc_id", "text")
    val out = Dsir.weights(raw, raw.filter(col("doc_id") <= 10), "doc_id", "text", b = 256)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    (1L to 10L).foreach(i => assert(out(i) == 1L, s"target-like doc $i dropped"))
    (11L to 20L).foreach(i => assert(out(i) == 0L, s"off-target doc $i kept"))
  }

  test("Dsir bigram lane separates on word order where unigrams cannot") {
    import graft.operators.Dsir
    // identical unigram bags, opposite adjacency: "a b a b" vs "b a b a"
    val raw = ((1L to 10L).map(i => (i, "a b a b")) ++
      (11L to 20L).map(i => (i, "b a b a"))).toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") <= 10)
    // unigram model: every doc has the same per-token score -> nobody is
    // strictly above the mean, keep is all-zero
    val uni = Dsir.weights(raw, tgt, "doc_id", "text", b = 64)
      .collect().map(r => r.getLong(3))
    assert(uni.forall(_ == 0L), "unigrams should not separate equal bags")
    // bigram model: 'a b' adjacency dominates the target -> exactly the
    // target-ordered docs clear the mean
    val bi = Dsir.weights(raw, tgt, "doc_id", "text", b = 64, bigrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    (1L to 10L).foreach(i => assert(bi(i) == 1L, s"target-ordered doc $i dropped"))
    (11L to 20L).foreach(i => assert(bi(i) == 0L, s"off-order doc $i kept"))
  }

  test("Dsir weights are partitioning-invariant (exact integer sums)") {
    import graft.operators.Dsir
    val raw = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "aa bb cc dd" else "ee ff gg hh ii")).toDF("doc_id", "text")
    val tgt = raw.filter(col("doc_id") % 3 === 0)
    val a = Dsir.weights(raw, tgt, "doc_id", "text", b = 128)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val b = Dsir.weights(raw.repartition(13), tgt.repartition(7), "doc_id", "text", b = 128)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("Dsir.selectAboveMean is the exact cross-multiplied mean rule") {
    import graft.operators.Dsir
    val w = Seq((1L, 10L, 100L), (2L, 10L, -50L), (3L, 5L, 30L), (4L, 0L, 0L))
      .toDF("doc_id", "n_toks", "logw_fp")
    val out = Dsir.selectAboveMean(w).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val (sl, sn) = (100L - 50L + 30L, 25L)
    Seq((1L, 10L, 100L), (2L, 10L, -50L), (3L, 5L, 30L), (4L, 0L, 0L)).foreach {
      case (id, n, lw) =>
        val expect = if (BigInt(lw) * sn > BigInt(sl) * n) 1L else 0L
        assert(out(id) == expect, s"doc $id: got ${out(id)}, expected $expect")
    }
  }
}
