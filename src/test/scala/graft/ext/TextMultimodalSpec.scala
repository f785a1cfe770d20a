package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E4 text analysis + E5 multimodal plumbing. */
class TextMultimodalSpec extends SparkSpec {

  private def doc(id: Long, text: String) = {
    import spark.implicits._
    Seq((id, text)).toDF("doc_id", "text")
  }

  test("token stats on a known sentence") {
    val row = TextOps.tokenStats(
      doc(1, "the quick the fox"), "doc_id", "text").collect().head
    assert(row.getAs[Long]("n_tokens") == 4)
    assert(row.getAs[Long]("n_types") == 3)
    assert(row.getAs[Long]("n_chars_calc") == 17)
    assert(row.getAs[Double]("mean_token_len") == (3 + 5 + 3 + 3) / 4.0)
  }

  test("pii redaction scrubs emails, ips and ssn-shaped ids with counts") {
    val row = TextOps.piiRedact(doc(1,
      "mail a.b+c@ex.co.uk or b@x.io, host 192.168.0.1, ssn 123-45-6789, v1.2 ok"),
      "doc_id", "text").collect().head
    assert(row.getAs[String]("clean") ==
      "mail <EMAIL> or <EMAIL>, host <IP>, ssn <ID>, v1.2 ok")
    assert(row.getAs[Long]("n_emails") == 2)
    assert(row.getAs[Long]("n_ips") == 1)
    assert(row.getAs[Long]("n_ids") == 1)
  }

  test("pii redaction leaves clean text untouched and counts zero") {
    val row = TextOps.piiRedact(doc(2, "no pii here, just words and 42"),
      "doc_id", "text").collect().head
    assert(row.getAs[String]("clean") == "no pii here, just words and 42")
    assert(row.getAs[Long]("n_emails") == 0)
    assert(row.getAs[Long]("n_ips") == 0)
    assert(row.getAs[Long]("n_ids") == 0)
  }

  test("pii redaction: property — counts and scrub match a reference regex pass") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "words")
    val email = Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.oneOf("ex.org", "a.co.uk"))
      .map { case (u, h) => s"${u.take(8)}@$h" }
    val ip = Gen.listOfN(4, Gen.choose(0, 299)).map(_.mkString("."))
    val ssn = Gen.zip(Gen.choose(100, 999), Gen.choose(10, 99), Gen.choose(1000, 9999))
      .map { case (a, b, c) => s"$a-$b-$c" }
    val token = Gen.frequency(6 -> word, 1 -> email, 1 -> ip, 1 -> ssn)
    val text = Gen.listOfN(30, token).map(_.mkString(" "))
    val seed0 = org.scalacheck.rng.Seed(13L)
    val texts = Iterator.iterate(seed0)(_.next).take(20)
      .flatMap(text.apply(Gen.Parameters.default, _)).toList
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.piiRedact(df, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    texts.zip(got).foreach { case (t, row) =>
      // reference pass: the same chained java.util.regex semantics
      def rx(p: String) = p.r.findAllIn(t).size
      assert(row.getAs[Long]("n_emails") == rx(TextOps.EmailRe), s"emails in: $t")
      assert(row.getAs[Long]("n_ips") == rx(TextOps.Ipv4Re), s"ips in: $t")
      assert(row.getAs[Long]("n_ids") == rx(TextOps.SsnRe), s"ids in: $t")
      val expect = t.replaceAll(TextOps.EmailRe, "<EMAIL>")
        .replaceAll(TextOps.SsnRe, "<ID>").replaceAll(TextOps.Ipv4Re, "<IP>")
      assert(row.getAs[String]("clean") == expect)
      assert(!row.getAs[String]("clean").matches(s".*${TextOps.EmailRe}.*"),
        "no email survives the scrub")
    }
  }

  test("vocabulary: frequency floor, tie order, dense ids, top-k plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a b d d")).toDF("doc_id", "text")
    val v = TextOps.vocabulary(docs, "text", minCount = 2, k = 2)
    val rows = v.orderBy(col("token_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: b=4, a=3, d=2, c=1(floored); k=2 keeps b,a with ids 0,1
    assert(rows.toSeq == Seq(("b", 4L, 0L), ("a", 3L, 1L)))
    // ties order lexicographically: equal counts -> term asc
    val tied = TextOps.vocabulary(
      Seq((1L, "x y x y")).toDF("doc_id", "text"), "text", 1, 2)
      .orderBy(col("token_id")).collect().map(_.getString(0)).toSeq
    assert(tied == Seq("x", "y"))
    // scale shape: top-k is TakeOrderedAndProject, no global sort of the
    // term distribution (the only range exchange would be a full sort)
    val p = v.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
  }

  test("tokenize: vocab ids in position order, OOV -1, vocab broadcast") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a zz b")).toDF("doc_id", "text")
    val vocab = TextOps.vocabulary(docs, "text", minCount = 2, k = 10)
    // counts: b=4(id 0), a=3(id 1); c and zz floored out -> OOV
    val out = TextOps.tokenize(docs, "doc_id", "text", vocab)
    val rows = out.orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(rows(1L) == List(0L, 0L, 0L, 1L, 1L, -1L))
    assert(rows(2L) == List(1L, -1L, 0L))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"vocab lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "token-vocab join must never shuffle tokens")
  }

  test("subword count splits letter/digit/punct boundaries") {
    val n = doc(1, "abc123 def!").select(
      TextOps.subwordCount(col("text")).as("n")).collect().head.getInt(0)
    assert(n == 4) // abc | 123 | def | !
  }

  test("subwordClasses: native one-pass equals the 4-regex formulation on BMP strings") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "   ", "abc", "123", "!!", "abc123 def!", "a1b2c3",
      "  leading", "trailing  ", "tabs\tand\nnewlines", "é ünïcödé, wörld!",
      "a-b-c 1-2-3", "ALLCAPS lower MiXeD 007 ...", "ß∂ƒ© µ≈ç√",
      "x" * 500, ("ab1! " * 100).trim)
    val df = edge.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = TextOps.subwordClasses(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val regex = TextOps.subwordClassesRegex(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native === regex)
  }

  test("subwordClasses: astral codepoints count ONCE on both flavors (codepoint semantics)") {
    import spark.implicits._
    // U+1F600 (a surrogate pair in UTF-16, 4 bytes in UTF-8) is one
    // codepoint = one mark on the native byte pass AND on Java regex
    // (char classes match codepoints) AND on the DuckDB/RE2 oracle —
    // all three agree, pinned here so none can drift
    val df = Seq((1L, "a 😀 b")).toDF("doc_id", "text")
    for (flavor <- Seq(TextOps.subwordClasses(df, "doc_id", "text"),
        TextOps.subwordClassesRegex(df, "doc_id", "text"))) {
      val row = flavor.collect().head
      assert(row.getAs[Long]("n_marks") === 1L)
      assert(row.getAs[Long]("n_alpha_runs") === 2L)
      assert(row.getAs[Long]("n_subwords") === 3L)
    }
  }

  test("subwordClasses projection stays inside whole-stage codegen") {
    // non-literal input (parquet scan) so ConvertToLocalRelation can't
    // constant-fold the projection away before it reaches codegen
    val docs = graft.Tables.documents(spark, sf001)
    val plan = TextOps.subwordClasses(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // '*(n)' is the WholeStageCodegen marker in the plan's short form
    assert(plan.contains("*(1) Project"), s"expected a codegen'd projection:\n$plan")
  }

  test("language ID picks the profile with most stopword hits") {
    val en = TextOps.langId(doc(1, "the cat is on the mat"), "doc_id", "text")
      .collect().head
    assert(en.getAs[String]("lang_guess") == "en")
    val de = TextOps.langId(doc(2, "der hund ist nicht auf und das"), "doc_id", "text")
      .collect().head
    assert(de.getAs[String]("lang_guess") == "de")
    val und = TextOps.langId(doc(3, "zzz qqq"), "doc_id", "text").collect().head
    assert(und.getAs[String]("lang_guess") == "und")
  }

  test("quality score ratios on constructed text") {
    val row = TextOps.qualityScore(doc(1, "the end. 42!"), "doc_id", "text")
      .collect().head
    assert(row.getAs[Double]("n_chars_calc") == 12.0)
    assert(row.getAs[Double]("punct_ratio") == 2.0 / 12) // '.' and '!'
    assert(row.getAs[Double]("digit_ratio") == 2.0 / 12)
    assert(row.getAs[Double]("stopword_ratio") == 1.0 / 3)
  }

  test("fingerprint equals md5 of utf-8 bytes; identical text collides") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val fps = TextOps.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
    assert(fps(1L).matches("[0-9a-f]{32}"))
  }

  test("multimodal: metadata pass never needs the payload decoded") {
    val media = Multimodal.mediaTable(doc(7L, "hello"))
    val m = Multimodal.metadata(media).collect().head
    assert(m.getAs[String]("format") == "jpeg") // 7 % 3 = 1 -> index 2
    assert(m.getAs[Int]("width") == (7 % 8) * 160 + 320)
    assert(m.getAs[Int]("height") == (7 % 5) * 90 + 180)
    assert(m.getAs[Long]("n_bytes") == 5L)
  }

  test("multimodal: decode stub via mapPartitions is deterministic and resizes") {
    val media = Multimodal.mediaTable(doc(7L, "hello world, a payload of bytes"))
    val f = Multimodal.decodeFeatures(spark, media, targetW = 256, targetH = 256)
      .collect().head
    assert(f.doc_id == 7L)
    assert(f.n_bytes == 31L)
    assert(f.out_width == 256 && f.out_height == 256) // clamped to box
    assert(f.feature.length == 4)
    // byte sampling is deterministic: run twice, same features
    val g = Multimodal.decodeFeatures(spark, media, 256, 256).collect().head
    assert(f.feature.toSeq == g.feature.toSeq)
  }

  test("bmp: encode/decode round-trips a known byte grid (real codec)") {
    val text = "The quick brown fox jumps over the lazy dog."
    val src = text.getBytes("UTF-8")
    val w = 5; val h = 3 // rowSize 16 > 15: padding byte exercised
    val payload = Multimodal.Bmp.encode(w, h, src)
    assert(payload.length == 54 + 16 * h)
    assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
    val f = Multimodal.BmpDecoder.decode(
      Multimodal.MediaRow(9L, payload, "bmp", w, h), 6, 4)
    def corner(pos: Int): Long =
      (0 until 3).map(c => src((pos * 3 + c) % src.length) & 0xff).sum.toLong
    assert(f.feature.toSeq ==
      Seq(corner(0), corner(w - 1), corner((h - 1) * w), corner(h * w - 1)))
    assert(f.n_bytes == payload.length.toLong)
    assert(f.out_width == 5 && f.out_height == 3)
  }

  test("bmp: decoder honors top-down row order and rejects non-BMP") {
    val src = "abcdefghijklmnopqrstuvwxyz".getBytes("UTF-8")
    val w = 4; val h = 2
    val bottomUp = Multimodal.Bmp.encode(w, h, src)
    // hand-flip to top-down: negate height, swap the two pixel rows
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    val rs = Multimodal.Bmp.rowSize(w)
    for (i <- 0 until rs) {
      topDown(54 + i) = bottomUp(54 + rs + i)
      topDown(54 + rs + i) = bottomUp(54 + i)
    }
    val a = Multimodal.BmpDecoder.decode(
      Multimodal.MediaRow(1L, bottomUp, "bmp", w, h), 6, 4)
    val b = Multimodal.BmpDecoder.decode(
      Multimodal.MediaRow(1L, topDown, "bmp", w, h), 6, 4)
    assert(a.feature.toSeq == b.feature.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.BmpDecoder.decode(
        Multimodal.MediaRow(2L, "not a bitmap at all".getBytes, "bmp", 1, 1), 6, 4)
    }
    // hostile headers reject cleanly, never index out of bounds
    def corrupt(at: Int, v: Int): Array[Byte] = {
      val b = Multimodal.Bmp.encode(4, 2, "abcdef".getBytes)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(at, v)
      b
    }
    for ((at, v) <- Seq((18, -4), (18, 0), (10, 7), (10, 1 << 30), (18, 1 << 24))) {
      val e = intercept[IllegalArgumentException] {
        Multimodal.BmpDecoder.decode(
          Multimodal.MediaRow(3L, corrupt(at, v), "bmp", 4, 2), 6, 4)
      }
      assert(e.getMessage.contains("doc 3"), s"($at,$v): ${e.getMessage}")
    }
  }

  test("bmp: media table generates real BMPs and the pipeline decodes them") {
    val docs = doc(12L, "some document text for the pixel grid")
    val media = Multimodal.bmpMediaTable(spark, docs)
    val row = media.collect().head
    val payload = row.getAs[Array[Byte]]("payload")
    assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
    assert(row.getAs[String]("format") == "bmp")
    val w = (4 + 12 % 5); val h = (3 + 12 % 4) // 6 x 3
    assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
    val f = Multimodal.decodeFeatures(spark, media, 6, 4,
      decoder = Multimodal.BmpDecoder).collect().head
    assert(f.out_width == math.min(w, 6) && f.out_height == math.min(h, 4))
    val src = "some document text for the pixel grid".getBytes("UTF-8")
    assert(f.feature(0) == (0 until 3).map(c => src(c % src.length) & 0xff).sum.toLong)
    // empty text: all-zero pixel grid, zero features
    val empty = Multimodal.decodeFeatures(spark,
      Multimodal.bmpMediaTable(spark, doc(3L, "")), 6, 4,
      decoder = Multimodal.BmpDecoder).collect().head
    assert(empty.feature.toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("chunking: windows cover every token with exact overlap") {
    import spark.implicits._
    def chunksOf(text: String, chunk: Int, overlap: Int) =
      TextOps.chunk(doc(1L, text), "doc_id", "text", chunk, overlap)
        .orderBy(col("chunk_id"))
        .select("chunk_id", "n_tokens", "chunk_text")
        .as[(Long, Long, String)].collect().toList

    // 5 tokens, chunk=3, overlap=1 -> starts 0 and 2
    assert(chunksOf("a b c d e", 3, 1) ==
      List((0L, 3L, "a b c"), (1L, 3L, "c d e")))
    // consecutive chunks share exactly `overlap` tokens
    val cs = chunksOf(Seq.tabulate(20)(i => s"t$i").mkString(" "), 8, 3)
    cs.sliding(2).foreach {
      case List((_, _, a), (_, _, b)) =>
        assert(a.split(' ').takeRight(3).toSeq == b.split(' ').take(3).toSeq)
      case _ =>
    }
    // every token appears in at least one chunk, in order
    assert(cs.flatMap(_._3.split(' ')).distinct == Seq.tabulate(20)(i => s"t$i"))
    // a doc shorter than the window is one chunk; never a pure-overlap tail
    assert(chunksOf("x y", 8, 3) == List((0L, 2L, "x y")))
    assert(chunksOf(Seq.tabulate(8)(i => s"t$i").mkString(" "), 8, 3).size == 1)
    // empty text: split yields one empty token -> one empty chunk
    assert(chunksOf("", 4, 1) == List((0L, 1L, "")))
    // geometry guards
    intercept[IllegalArgumentException] {
      TextOps.chunk(doc(1L, "a"), "doc_id", "text", 4, 4)
    }
  }

  test("multimodal: parquet media scan prunes the binary payload for metadata-only reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.bmpMediaTable(spark, doc(5L, "pixel payload text here"))
      .write.mode("overwrite").parquet(dir)
    val dims = spark.read.parquet(dir).select("doc_id", "format", "width", "height")
    val plan = dims.queryExecution.executedPlan.toString
    // the claim e12 makes at 100 TB: dimension/format projections never
    // deserialize the media bytes — ReadSchema excludes the payload column
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("payload"),
      s"payload not pruned from scan:\n$plan")
    assert(dims.count() == 1)
  }

  test("tfidf: rarer terms weigh more; scores are exact integers; weights broadcast") {
    import spark.implicits._
    // 4 docs; "rare" appears in 1, "common" in all 4
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common common"),
      (3L, "common stuff here"),
      (4L, "common more words")).toDF("doc_id", "text")
    val hits = TextOps.tfidfTopK(docs, "doc_id", "text",
      terms = Seq("rare", "common"), k = 4)
    val rows = hits.select("doc_id", "score", "rn")
      .as[(Long, Long, Long)].collect().toList
    // weights: N=4, scale 1e6 -> w(rare)=4000000, w(common)=1000000
    // doc1 = 1*4e6 + 1*1e6; doc2 = tf2 * 1e6; docs 3,4 = 1e6 (tie -> id)
    assert(rows == List(
      (1L, 5000000L, 1L), (2L, 2000000L, 2L), (3L, 1000000L, 3L), (4L, 1000000L, 4L)))
    // the |terms|-row weights side must broadcast, never shuffle-join
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights join not broadcast:\n$plan")
  }

  test("bmp: nearest-neighbor resize samples the mapped grid, identity when box fits") {
    val text = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val src = text.getBytes("UTF-8")
    val w = 8; val h = 6
    val row = Multimodal.MediaRow(3L, Multimodal.Bmp.encode(w, h, src), "bmp", w, h)
    val rz = Multimodal.BmpResizeDecoder.decode(row, 6, 4)
    assert(rz.out_width == 6 && rz.out_height == 4)
    def corner(x: Int, y: Int): Long = {
      val pos = y * w + x
      (0 until 3).map(c => src((pos * 3 + c) % src.length) & 0xff).sum.toLong
    }
    // right/bottom corners map through the NN grid: (5*8)/6=6, (3*6)/4=4
    assert(rz.feature.toSeq ==
      Seq(corner(0, 0), corner(6, 0), corner(0, 4), corner(6, 4)))
    // the source-corner decoder disagrees exactly where the shrink bites
    val plain = Multimodal.BmpDecoder.decode(row, 6, 4)
    assert(plain.feature.toSeq ==
      Seq(corner(0, 0), corner(7, 0), corner(0, 5), corner(7, 5)))
    // a box that already fits is the identity: both decoders agree
    val id1 = Multimodal.BmpResizeDecoder.decode(row, 8, 6)
    val id2 = Multimodal.BmpDecoder.decode(row, 8, 6)
    assert(id1.feature.toSeq == id2.feature.toSeq)
  }

  test("bmp: property — round trip holds over random geometry and payload") {
    import org.scalacheck.Gen
    val cases = Gen.zip(Gen.choose(1, 13), Gen.choose(1, 9),
      Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
    val seeds = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seeds)(_.next).take(60).foreach { seed =>
      cases.apply(Gen.Parameters.default, seed).foreach { case (w, h, bytes) =>
        val payload = Multimodal.Bmp.encode(w, h, bytes)
        val f = Multimodal.BmpDecoder.decode(
          Multimodal.MediaRow(1L, payload, "bmp", w, h), w, h)
        assert(f.n_bytes == 54L + Multimodal.Bmp.rowSize(w) * h)
        assert(f.out_width == w && f.out_height == h)
        def expect(pos: Int): Long =
          if (bytes.isEmpty) 0L
          else (0 until 3).map(c => bytes((pos * 3 + c) % bytes.length) & 0xff).sum.toLong
        assert(f.feature.toSeq ==
          Seq(expect(0), expect(w - 1), expect((h - 1) * w), expect(h * w - 1)))
      }
    }
  }

  test("sequence packing: budget respected up to one chunk of overflow; single exchange") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val chunks = TextOps.chunk(docs, "doc_id", "text", chunkTokens = 64, overlapTokens = 0)
    val budget = 256
    val packed = TextOps.packSequences(chunks, "doc_id", "chunk_id", "n_tokens",
      budget = budget, buckets = 8)
    val rows = packed.as[(Long, Long, Int, Long, Long)].collect()
    assert(rows.length == chunks.count(), "every chunk is packed exactly once")
    // greedy-sequential semantics: within a (bucket, seq), total tokens
    // exceed the budget by AT MOST the final (boundary-crossing) chunk
    rows.groupBy(r => (r._3, r._4)).foreach { case ((b, s), rs) =>
      val total = rs.map(_._5).sum
      val lastChunk = rs.maxBy(r => (r._1, r._2))._5
      assert(total - lastChunk < budget,
        s"bucket $b seq $s: ${total} tokens with last chunk $lastChunk breaks the overflow bound")
    }
    // sequences are contiguous per bucket (no gaps in seq_id)
    rows.groupBy(_._3).foreach { case (b, rs) =>
      val seqs = rs.map(_._4).distinct.sorted.toList
      assert(seqs == (0L until seqs.length).toList,
        s"bucket $b seq ids not contiguous: $seqs")
    }
    // scale shape: ONE exchange, on the bucket key (no global sort)
    val plan = packed.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1 && plan.contains("hashpartitioning(bucket"),
      s"packing must shuffle once on bucket:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange rangepartitioning"), "no global sort in packing")
  }

  test("chunking: property — full coverage and exact overlap at random geometry") {
    import org.scalacheck.Gen
    import spark.implicits._
    val cases = Gen.zip(Gen.choose(1, 120), Gen.choose(2, 12))
      .flatMap { case (n, c) => Gen.choose(0, c - 1).map(o => (n, c, o)) }
    val seed0 = org.scalacheck.rng.Seed(7L)
    Iterator.iterate(seed0)(_.next).take(25).foreach { seed =>
      cases.apply(Gen.Parameters.default, seed).foreach { case (n, c, o) =>
        val toks = Seq.tabulate(n)(i => s"w$i")
        val out = TextOps.chunk(doc(9L, toks.mkString(" ")), "doc_id", "text", c, o)
          .orderBy(col("chunk_id")).select("chunk_text", "n_tokens")
          .as[(String, Long)].collect().toList
        val chunks = out.map(_._1.split(' ').toSeq)
        // coverage in order, no token lost or reordered
        assert(chunks.head.head == "w0" && chunks.last.last == s"w${n - 1}")
        assert(chunks.flatten.distinct == toks)
        // every non-final chunk is full size; overlap is exact
        chunks.init.foreach(ch => assert(ch.size == c))
        chunks.sliding(2).foreach {
          case List(a, b) => assert(a.takeRight(o) == b.take(o))
          case _ =>
        }
        // n_tokens matches the materialized chunk
        out.foreach { case (t, nt) => assert(t.split(' ').length.toLong == nt) }
      }
    }
  }

  test("novelty: unique bigrams score scale, repeated corpus bigrams score less") {
    import spark.implicits._
    // "a b" occurs 3x corpus-wide; every other gram once
    val docs = Seq(
      (1L, "a b c"),       // grams: "a b"(cf 3), "b c"(cf 1)
      (2L, "a b a b"),     // grams: "a b"(3), "b a"(1), "a b"(3)
      (3L, "x"),           // < 2 tokens: ONE whole-text gram (the
                           // shingle convention e02/e24 declare)
      (4L, "p q")).toDF("doc_id", "text") // one unique gram
    val rows = TextOps.noveltyScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toList
    // doc1: (1e6/3=333333 + 1e6)/2 = 666666.5; doc2: (333333+1e6+333333)/3
    // = 555555.3333 -> .3333; doc3 and doc4: one unique gram each -> 1e6
    assert(rows == List(
      (1L, 2L, 666666.5), (2L, 3L, 555555.3333),
      (3L, 1L, 1000000.0), (4L, 1L, 1000000.0)))
  }

  test("multimodal: lenient decode isolates bad rows as data, not task aborts") {
    import spark.implicits._
    val docs = Seq((0L, "corrupt me"), (1L, "healthy payload text"))
      .toDF("doc_id", "text")
    val media = Multimodal.bmpMediaTable(spark, docs, corruptEvery = 97)
    val rows = Multimodal.decodeFeaturesLenient(spark, media, 6, 4,
      decoder = Multimodal.BmpDecoder)
      .collect().sortBy(_.doc_id)
    assert(!rows(0).ok && rows(0).error.contains("doc 0") && rows(0).feature.isEmpty)
    assert(rows(0).n_bytes == "corrupt me".length.toLong)
    assert(rows(1).ok && rows(1).error.isEmpty && rows(1).feature.length == 4)
    // the strict path still throws on the same batch
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark, media, 6, 4,
        decoder = Multimodal.BmpDecoder).collect()
    }
  }

  test("multimodal: frame offsets stride the payload") {
    import spark.implicits._
    val media = Multimodal.mediaTable(doc(1L, "0123456789"))
    val offs = Multimodal.frameOffsets(media, 4)
      .select(explode(col("frame_offsets")).as("o"))
      .select(col("o").cast("long")).as[Long].collect().toList
    assert(offs == List(0L, 4L, 8L))
  }

  test("bpe merges: hand-computed rounds, count weighting, dry stop") {
    import spark.implicits._
    // word types: aa ×2, ab ×1 → pairs round 1: (a a)=2, (a b)=1.
    // After merging (a a): aa is one symbol, only (a b)=1 remains.
    // Round 3 has no pairs left → training stops early (dry).
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val m = TextOps.bpeMerges(docs, "text", rounds = 5)
      .as[(Long, String, String, Long)].collect().toList
    assert(m == List((1L, "a a", "aa", 2L), (2L, "a b", "ab", 1L)))
  }

  test("bpe merges: later rounds merge previously-merged symbols") {
    import spark.implicits._
    // abc ×3: round 1 merges (a b) and (b c) tie at 3 → tie-break on
    // pair text picks "a b"; round 2 merges (ab c) — a merged symbol
    // participating as a unit, the composition property of BPE.
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val m = TextOps.bpeMerges(docs, "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().toList
    assert(m == List((1L, "a b", "ab", 3L), (2L, "ab c", "abc", 3L)))
  }

  test("bpe merge application: self-pair on odd run is deterministic") {
    import spark.implicits._
    // "aaa" under merge (a a): the padded double replace leaves "aa a"
    // (leftmost-first, non-overlapping) — same on both engines.
    val cur = Seq(("aaa", 1L, "a a a"), ("aaaa", 1L, "a a a a"))
      .toDF("term", "n", "seq")
    val out = TextOps.bpeApplyMerge(cur, "a a")
      .select("term", "seq").as[(String, String)].collect().toMap
    assert(out("aaa") == "aa a")
    assert(out("aaaa") == "aa aa")
  }

  test("bpe encode: hand-computed ids, n_words/n_subwords, partial merge") {
    import spark.implicits._
    // types: aa ×2, ab ×1. rounds=1 merges (a a): front aa→"aa", ab→"a b"
    // symbols by (count desc, sym): aa(2)→0, a(1)→1, b(1)→2
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val m1 = TextOps.bpeFit(docs, "text", rounds = 1)
    assert(m1.symbols == Seq(("aa", 2L), ("a", 1L), ("b", 1L)))
    val enc1 = TextOps.bpeEncode(docs, "doc_id", "text", m1)
      .as[(Long, Seq[Long], Long, Long)].collect().sortBy(_._1).toList
    assert(enc1 == List((1L, Seq(0L, 1L, 2L), 3L, 2L), (2L, Seq(0L), 1L, 1L)))
    // rounds=5 runs dry after (a a),(a b): both words one symbol
    val m2 = TextOps.bpeFit(docs, "text", rounds = 5)
    assert(m2.merges.map(m => (m.pair, m.merged)) == Seq(("a a", "aa"), ("a b", "ab")))
    val enc2 = TextOps.bpeEncode(docs, "doc_id", "text", m2)
      .as[(Long, Seq[Long], Long, Long)].collect().sortBy(_._1).toList
    assert(enc2 == List((1L, Seq(0L, 1L), 2L, 2L), (2L, Seq(0L), 1L, 1L)))
  }

  test("bpe encode: subwords concatenate back to the pre-tokenized words (roundtrip)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001).limit(50)
    val model = TextOps.bpeFit(docs, "text", rounds = 6)
    val id2sym = model.symbols.zipWithIndex.map { case ((s, _), i) => (i.toLong, s) }.toMap
    val enc = TextOps.bpeEncode(docs, "doc_id", "text", model)
      .select("doc_id", "token_ids", "n_words")
      .as[(Long, Seq[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val words = docs.select(col("doc_id"),
      regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+"), lit(0)).as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    words.foreach { case (id, ws) =>
      if (ws.nonEmpty) {
        val (ids, nWords) = enc(id)
        assert(nWords == ws.length, s"doc $id word count")
        // merges never cross word boundaries, so the decoded symbol
        // stream must concatenate to exactly the word concatenation
        assert(ids.map(id2sym).mkString == ws.mkString, s"doc $id roundtrip")
      } else assert(!enc.contains(id), s"doc $id has no words, must be absent")
    }
  }

  test("bpe decode: distributed detokenization round-trips the corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001).limit(80)
    val model = TextOps.bpeFit(docs, "text", rounds = 6)
    val enc = TextOps.bpeEncode(docs, "doc_id", "text", model)
    val rt = TextOps.bpeDecode(enc, Seq("doc_id"), "token_ids", model)
      .as[(Long, String)].collect().toMap
    val expect = docs.select(col("doc_id"),
      concat_ws("",
        regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+"), lit(0))).as("t"))
      .as[(Long, String)].collect().toMap
    expect.foreach { case (id, t) =>
      if (t.nonEmpty) assert(rt(id) == t, s"doc $id decode roundtrip")
      else assert(!rt.contains(id), s"doc $id has no tokens, must be absent")
    }
    // plan shape: the symbol join is a broadcast — the corpus never
    // shuffles for the symbol lookup
    val plan = TextOps.bpeDecode(enc, Seq("doc_id"), "token_ids", model)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast symbol join:\n$plan")
  }

  test("bpe encode scale shape: broadcast symbol join, one reassembly exchange") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val model = TextOps.bpeFit(docs, "text", rounds = 3)
    val plan = TextOps.bpeEncode(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "symbol lookup must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join anywhere in encode")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"exactly the per-document reassembly exchange:\n${plan.take(1500)}")
  }

  test("bpe scale shape: one exchange per pair-count round, map-only merge") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf001)
    val front = TextOps.bpeWordFront(docs, "text")
    // the front itself is ONE exchange (the term agg)
    val frontPlan = front.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(frontPlan).size == 1,
      s"word front must aggregate in one exchange:\n${frontPlan.take(1200)}")
    // each round's pair distribution adds exactly ONE more exchange
    // (the pair agg); the top-1 is TakeOrderedAndProject, not a sort
    val top = TextOps.bpePairCounts(front)
      .orderBy(col("cnt").desc, col("pair")).limit(1)
    val topPlan = top.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(topPlan).size == 2,
      s"pair count must add one exchange over the front:\n${topPlan.take(1200)}")
    assert(topPlan.contains("TakeOrderedAndProject"),
      "top pair must be TakeOrderedAndProject, not a global sort")
    // applying a merge is map-only: no exchange beyond the front's own
    val appliedPlan = TextOps.bpeApplyMerge(front, "e r")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(appliedPlan).size == 1,
      s"merge application must be map-only:\n${appliedPlan.take(1200)}")
  }

  test("unigram surprisal: hand-computed micro-nats, verdict gate") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // corpus LM: c(a)=2 c(b)=2 c(c)=1, T=5
    def sMicro(c: Long) = math.floor(-math.log(c.toDouble / 5) * 1e6).toLong
    val out = TextOps.unigramSurprisal(df, "doc_id", "text",
      flagAboveMicro = 1000000L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("surprisal_micro"), r.getAs[Long]("avg_surprisal_micro"),
        r.getAs[String]("verdict"))).sortBy(_._1).toSeq
    val d1Sum = 2 * sMicro(2) + sMicro(2)
    val d2Sum = sMicro(2) + sMicro(1)
    assert(out == Seq(
      (1L, 3L, d1Sum, d1Sum / 3, "keep"),
      (2L, 2L, d2Sum, d2Sum / 2, "flag")), out.mkString(","))
  }

  test("bm25: saturation, length normalization, exact integer scores, top-k") {
    import spark.implicits._
    val df = Seq((1L, "q w w w"), (2L, "q q w w"), (3L, "q"), (4L, "z z z z"))
      .toDF("doc_id", "text")
    // N=4 docs, T=13 tokens, df(q)=3
    val idfMicro = math.floor(math.log(1.0 + (4.0 - 3 + 0.5) / (3 + 0.5)) * 1e6).toLong
    def contrib(tf: Long, dl: Long) = math.floor(
      (idfMicro * 22L * 13L * tf).toDouble / (10L * 13L * tf + 3L * 13L + 9L * dl * 4L)).toLong
    val out = TextOps.bm25TopK(df, "doc_id", "text", Seq("q"), k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("rn"))).sortBy(_._3).toSeq
    // ordering: short doc with the term beats saturated tf beats long
    // single-tf; the no-hit doc never appears
    assert(out == Seq(
      (3L, contrib(1, 1), 1L),
      (2L, contrib(2, 4), 2L),
      (1L, contrib(1, 4), 3L)), out.mkString(","))
    assert(contrib(2, 4) > contrib(1, 4), "tf saturation must still rank tf=2 above tf=1")
    assert(contrib(1, 1) > contrib(1, 4), "shorter doc with same tf must score higher")
    // k bounds the result
    assert(TextOps.bm25TopK(df, "doc_id", "text", Seq("q"), k = 2).count() == 2)
  }

  test("bm25 plan: top-k is TakeOrderedAndProject, weights broadcast, tf exchange reused") {
    val out = TextOps.bm25TopK(graft.Tables.documents(spark, sf001),
      "doc_id", "text", Seq("hash", "join"), k = 10)
    // AQE materializes exchange reuse only in the EXECUTED plan (the
    // PlanSpec E5/E6 discipline) — run before asserting
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast onto the tf side:\n${plan.take(1200)}")
    // the df branch and the scoring side sit on the SAME (doc, dl, term)
    // aggregate subplan — one token scan + one exchange, reused (the
    // dl-referencing df count exists exactly for this)
    assert(plan.contains("ReusedExchange"),
      s"tf exchange must be computed once:\n${plan.take(2000)}")
  }

  test("featureHash: tf preserved through hashing, stable across partitionings") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "b b"), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.featureHash(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id", "bucket")
      .as[(Long, Long, Long)].collect().toSeq
    // total tf equals total non-empty tokens; empty doc contributes none
    assert(out.map(_._3).sum == 6L)
    assert(out.forall { case (_, b, _) => b >= 0 && b < 16 })
    assert(!out.exists(_._1 == 3L))
    // doc 1: token 'a' twice lands in ONE bucket with tf=2
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).sum == 4L && d1.exists(_._3 == 2L))
    // same bucket ids at any partitioning (vocabulary-free stability)
    val re = TextOps.featureHash(docs.repartition(7), "doc_id", "text", dim = 16)
      .orderBy("doc_id", "bucket").as[(Long, Long, Long)].collect().toSeq
    assert(re == out)
  }
}
