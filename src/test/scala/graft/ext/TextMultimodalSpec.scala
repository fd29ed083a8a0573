package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {

  test("lang-ID discriminates genuine multilingual text") {
    import spark.implicits._
    val samples = Seq(
      (1L, "en", "the weather this morning was the best thing about the whole trip"),
      (2L, "de", "ich möchte ein schönes Geschenk für der Kinder schicken"),
      (3L, "fr", "nous avons vu le chien qui courait vers le parc especially quand"),
      (4L, "es", " el perro corre hacia el mar y los árboles de la costa ")
    ).toDF("doc_id", "tagged_lang", "text")
    val out = TextAnalysis.langIdOf(samples).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "en", s"expected en, got ${out(1L)}")
    assert(out(2L) == "de", s"expected de, got ${out(2L)}")
    assert(out(4L) == "es", s"expected es, got ${out(4L)}")
  }

  test("fingerprint is order-sensitive and collision-free on permutations") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta alpha gamma"), // permutation — must differ
      (3L, "alpha beta gamma")  // identical — must match
    ).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"), graft.ext.Portable.tokens(col("text")).as("toks"))
      .withColumn("hs", transform(col("toks"),
        t => graft.ext.Portable.tokenHash(t)))
      .select(col("doc_id"), graft.ext.Portable.fold31(col("hs")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(3L), "identical texts must share a fingerprint")
    assert(fps(1L) != fps(2L), "token order must change the fingerprint")
  }

  test("quality score is bounded and penalizes stopword soup") {
    val rows = TextAnalysis.qualityScore(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val q = r.getDouble(2); q >= 0.0 && q <= 1.0
    })
    import spark.implicits._
    val soup = Seq((1L, "the a the a the a the a the a the a the a the a the a the a"),
      (2L, "stream filter window join hash scan merge sort batch value query part"))
      .toDF("doc_id", "text")
    val byId = soup.select(col("doc_id"), graft.ext.Portable.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        (size(filter(col("toks"), t => t === "the" || t === "a")).cast("double")
          / size(col("toks"))).as("stop_ratio"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) > 0.9 && byId(2L) == 0.0)
  }

  test("typed media pipeline decodes deterministic features in one pass") {
    val media = Multimodal.mediaRecords(spark, sf)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == media.count().toInt)
    val byId = feats.map(f => f.doc_id -> f).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- docs.take(5)) {
      val bytes = text.getBytes("UTF-8")
      val f = byId(id)
      assert(f.n_bytes == bytes.length)
      assert(math.abs(f.luma - bytes.map(_ & 0xff).sum.toDouble / bytes.length) < 1e-9)
      assert(f.histogram.sum == bytes.length)
    }
  }

  test("m3 dispatch routes each mime to its decoder and both branches agree on the pixel sum") {
    val rows = Multimodal.decodeDispatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.map(_._1).toSet == docs.keySet)
    for ((id, lumaSum, chk) <- rows) {
      val cps = docs(id).codePoints().toArray
      val w = (id % 4 + 1).toInt * 8; val h = (id % 3 + 1).toInt * 6
      val px = Array.tabulate(w * h)(i =>
        if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
      assert(lumaSum == px.map(_.toLong).sum, s"pixel sum for doc $id")
      // the checksum must come from THIS row's decoder: codec bins by
      // v>>4, stub by b%16 — a misrouted mime fails here
      val hist = new Array[Long](16)
      px.foreach(v => hist(if (id % 2 == 0) v >> 4 else v % 16) += 1)
      val expect = hist.foldLeft(0L)((a, c) => (a * 31 + c) % graft.ext.Portable.P)
      assert(chk == expect, s"dispatch checksum for doc $id (mime parity ${id % 2})")
    }
  }

  test("x22 vocab/OOV matches brute force and caps the vocabulary") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val cnt = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val got = TextAnalysis.vocabOov(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == docs.keySet)
    for ((id, toks) <- docs) {
      val nOov = toks.count(!vocab(_)).toLong
      val n = toks.size.toLong
      assert(got(id) == ((n, nOov, if (n > 0) nOov * 1000000L / n else 0L)),
        s"doc $id mismatch")
    }
    // the corpus must actually exceed the cap for the gate to mean anything
    assert(cnt.size > 20, "vocabulary smaller than the cap — OOV vacuous")
    assert(got.values.exists(_._2 > 0), "no OOV tokens anywhere — vacuous")
  }

  test("WAV codec: genuine RIFF payloads, bit-exact PCM round trip") {
    // fixture round trip, including negative samples and both byte orders
    val fixture = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = Multimodal.WavCodec.encodePcm(fixture)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "not a RIFF/WAVE payload")
    assert(Multimodal.WavCodec.decodePcm(wav).toSeq == fixture.toSeq)
    // pipeline payloads are all real WAV files
    val recs = Multimodal.wavRecords(spark, sf).collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      assert(r.data(0) == 'R' && r.data(8) == 'W', s"doc ${r.doc_id} not WAV")
      assert(r.mime == "audio/wav")
    }
  }

  test("WAV codec equals the JDK reference writer byte-for-byte; decode " +
      "reads JDK-written files and non-canonical chunk layouts") {
    // the hand-rolled encoder (adopted r14: AudioSystem re-resolves its
    // provider registry per call, serializing 32-thread codec passes)
    // must produce EXACTLY the bytes the JDK reference writer produces
    val jdkFormat = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, true, false)
    def jdkEncode(samples: Array[Short]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), jdkFormat, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, 256, 2048)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val ours = Multimodal.WavCodec.encodePcm(samples)
      val jdk = jdkEncode(samples)
      assert(ours.toSeq == jdk.toSeq, s"n=$n: encoder diverges from JDK")
      // and the JDK reader accepts our bytes (container validity both ways)
      val jdkRead = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(ours)).readAllBytes()
      assert(jdkRead.length == n * 2, s"n=$n: JDK reader rejects our bytes")
      assert(Multimodal.WavCodec.decodePcm(jdk).toSeq == samples.toSeq,
        s"n=$n: decode diverges on JDK-written bytes")
    }
    // chunk-walking: a LIST chunk (odd-length, so padded) before data
    val samples = Array[Short](42, -42, 17)
    val canonical = Multimodal.WavCodec.encodePcm(samples)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val shuffled = canonical.take(36) ++ extra ++ canonical.drop(36)
    // fix the RIFF size field for the inserted chunk
    val riffLen = (shuffled.length - 8)
    shuffled(4) = (riffLen & 0xff).toByte
    shuffled(5) = ((riffLen >> 8) & 0xff).toByte
    shuffled(6) = ((riffLen >> 16) & 0xff).toByte
    shuffled(7) = ((riffLen >> 24) & 0xff).toByte
    assert(Multimodal.WavCodec.decodePcm(shuffled).toSeq == samples.toSeq,
      "decode must walk past non-data chunks with odd-length padding")
  }

  test("m11: silence grid is exact; energy conserved against a driver replay") {
    val got = Multimodal.wavEnergy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == texts.keySet)
    for ((id, text) <- texts) {
      val n = ((id % 4) + 1).toInt * 512
      val cps = text.codePoints().toArray
      val samples = Array.tabulate(n) { i =>
        if ((i / 256) % 3 == 0) 0L
        else ((cps(i % cps.length) & 0xff) * 257 + i * 31) % 65536 - 32768
      }
      val frames = samples.grouped(256).toArray
      val expSilent = frames.count(_.map(math.abs).sum < 25600L).toLong
      val exp = (n.toLong, (n / 256).toLong, expSilent,
        frames.map(_.map(math.abs).sum).sum,
        samples.map(math.abs).max)
      assert(got(id) == exp, s"doc $id mismatch: ${got(id)} vs $exp")
      // every third frame is masked silent by construction
      assert(expSilent == (0 until n / 256).count(_ % 3 == 0).toLong)
    }
    // non-vacuous: active frames exist and carry real energy
    assert(got.values.forall(v => v._3 < v._2 && v._4 > 0L))
  }

  test("PNG codec: exact pixel stats on an embedded fixture") {
    // 2×2 gray fixture with known samples — exact luma and histogram
    val px = Array(0, 64, 128, 255)
    val bytes = Multimodal.PngCodec.encodeGray(2, 2, px)
    // real PNG: magic signature
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G', "not a PNG payload")
    val f = Multimodal.PngCodec.decode(
      Multimodal.MediaRecord(7L, bytes, "image/png", 2, 2))
    assert(f.doc_id == 7L)
    assert(f.n_bytes == bytes.length)
    assert(math.abs(f.luma - (0 + 64 + 128 + 255) / 4.0) < 1e-12)
    val expectHist = new Array[Long](16)
    px.foreach(v => expectHist(v >> 4) += 1)
    assert(f.histogram.toSeq == expectHist.toSeq)
  }

  test("PNG pipeline: real payloads round-trip bit-exactly through imageio") {
    val recs = Multimodal.pngRecords(spark, sf).collect()
    assert(recs.nonEmpty)
    // every payload is a genuine PNG file
    for (r <- recs.take(20))
      assert((r.data(0) & 0xff) == 0x89 && r.data(1) == 'P', s"doc ${r.doc_id}")
    val feats = Multimodal.decodeFeatures(Multimodal.pngRecords(spark, sf))
      .collect().map(f => f.doc_id -> f).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    for ((id, text) <- docs.take(10)) {
      val w = ((id % 4) + 1).toInt * 8
      val h = ((id % 3) + 1).toInt * 6
      val cps = text.codePoints().toArray
      val expected = Array.tabulate(w * h)(i =>
        if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
      val f = feats(id)
      assert(f.histogram.sum == w * h, s"doc $id: pixel count")
      assert(math.round(f.luma * w * h) == expected.map(_.toLong).sum,
        s"doc $id: luma sum")
      val hist = new Array[Long](16)
      expected.foreach(v => hist(v >> 4) += 1)
      assert(f.histogram.toSeq == hist.toSeq, s"doc $id: histogram")
    }
  }

  test("m8 phash matches a codec-free recompute; canonical groups dup images") {
    val rows = Multimodal.phashDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == docs.keySet, "one signature row per document")
    // recompute the hash from the SOURCE characters (never touching the
    // codec): a match here plus the oracle means decode + geometry agree
    def sigOf(id: Long, text: String): (Long, Long, Long) = {
      val w = ((id % 4) + 1).toInt * 8
      val h = ((id % 3) + 1).toInt * 6
      val cps = text.codePoints().toArray
      val s = Array.ofDim[Long](3, 4)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val v = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
        s(y * 3 / h)(x * 4 / w) += v
      }
      var sig = 0L
      for (r <- 0 until 3; c <- 0 until 3)
        if (s(r)(c) > s(r)(c + 1)) sig |= 1L << (r * 3 + c)
      for (r <- 0 until 2; c <- 0 until 4)
        if (s(r)(c) > s(r + 1)(c)) sig |= 1L << (9 + r * 4 + c)
      (w.toLong, h.toLong, sig)
    }
    for ((id, text) <- docs) {
      val (w, h, sig) = sigOf(id, text)
      val (gw, gh, gsig, _) = rows(id)
      assert((gw, gh, gsig) == (w, h, sig), s"doc $id: signature mismatch")
    }
    // canonical = min doc_id within each (w, h, phash) group
    val canon = rows.toSeq.groupBy { case (_, (w, h, p, _)) => (w, h, p) }
      .flatMap { case (_, xs) =>
        val m = xs.map(_._1).min; xs.map(x => x._1 -> m)
      }
    for ((id, (_, _, _, c)) <- rows)
      assert(c == canon(id), s"doc $id: canonical $c != ${canon(id)}")
    // the corpus must actually contain perceptual duplicates, else the
    // assignment is the identity and the test is vacuous
    assert(rows.exists { case (id, (_, _, _, c)) => c != id },
      "no perceptual duplicates at test SF — vacuous")
  }

  test("x25: lift matches an exact BigInt recompute; ranking is PMI-equivalent") {
    val texts = graft.Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val bis = texts.flatMap(t => t.split(" ").sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val c12 = bis.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = bis.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c2 = bis.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = BigInt(bis.length)
    val expect = c12.collect { case ((a, b), c) if c >= 5 =>
      val lift = (BigInt(c) * n * 1000000 / (BigInt(c1(a)) * BigInt(c2(b)))).toLong
      ((a, b), (c, c1(a), c2(b), lift))
    }.toSeq.sortBy { case ((a, b), (_, _, _, l)) => (-l, a, b) }.take(50)
    val got = TextAnalysis.collocations(spark, sf).collect().map(r =>
      ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.toSeq == expect, s"x25 mismatch:\ngot ${got.take(5).toSeq}\nexp ${expect.take(5)}")
    // lift orders like PMI: log is monotone, so the ppm ranking IS the
    // PMI ranking — spot-check the top pair co-occurs beyond chance
    assert(expect.head._2._4 > 1000000L, "top collocation has lift <= 1 — vacuous corpus")
  }

  test("media metadata query is a shuffle-free scan projection") {
    val p = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"metadata extraction must not shuffle:\n$p")
    val p2 = Multimodal.frameSample(spark, sf).queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"frame sampling must not shuffle:\n$p2")
  }

  test("m9: both corruption classes are caught by the codec, no false alarms") {
    val rows = Multimodal.decodeAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trunc = rows.filter(_._1 % 13 == 0)
    val magic = rows.filter(_._1 % 13 == 5)
    assert(trunc.nonEmpty && trunc.values.forall(_ == "corrupt"),
      "truncated payloads must classify corrupt")
    assert(magic.nonEmpty && magic.values.forall(_ == "corrupt"),
      "magic-flipped payloads must classify corrupt")
    assert(rows.filter(r => r._1 % 13 != 0 && r._1 % 13 != 5)
      .values.forall(_ == "ok"), "clean payload flagged — false alarm")
  }

  test("x26: products are exact, rank-1 is the reference, uniformity is flagged") {
    val rows = TextAnalysis.zipfAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1L to rows.length.toLong))
    assert(rows.forall(r => r._4 == r._1 * r._3), "rank_freq must be rank*freq")
    assert(rows.head._5 == 1000000L, "rank-1 must be the ppm reference")
    // frequencies are rank-ordered (ties broken by term)
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) => a._3 >= b._3; case _ => true })
    // the synthetic corpus is UNIFORM, not Zipfian — the audit must say
    // so (rank x freq grows ~linearly instead of staying ~flat)
    // (the tail also holds one genuinely rare token, "dup", whose
    // product dips back below 1e6 — the statistic moves both ways)
    assert(rows.map(_._5).max > 2000000L,
      "uniform generated vocabulary not flagged — vacuous audit")
  }

  test("x27: novelty partitions the shingle universe and genuinely decays") {
    val df = TextAnalysis.noveltyCurve(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "bucket doc counts must partition the corpus")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    // every distinct shingle is novel in exactly one bucket: the novel
    // counts partition the shingle universe
    val universe = Dedup.shingleFrame(spark, sf)
      .select("shingle").distinct().count()
    assert(rows.map(_._4).sum == universe,
      s"novel counts ${rows.map(_._4).sum} must sum to the universe $universe")
    // a bucket's novel shingles are a subset of its distinct shingles
    assert(rows.forall(r => r._4 <= r._3))
    for ((_, _, nsh, nov, p) <- rows)
      assert(p == (BigInt(nov) * 1000000 / BigInt(math.max(nsh, 1L))).toLong)
    // the curve must MEASURE saturation: the first bucket sees shingles
    // first, the last bucket mostly re-treads — strict decay end-to-end
    assert(rows.head._5 > rows.last._5,
      s"no novelty decay: ${rows.map(_._5).mkString(",")}")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in x27:\n$p")
  }

  test("x28 RAKE equals a brute driver fold; top-K never globally sorts") {
    val df = TextAnalysis.rakeKeyphrases(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // brute: same candidate rule, same floored-ppm word scores
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val stops = TextAnalysis.RakeStopwords.toSet
    val inst = texts.toSeq.flatMap { t =>
      val runs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      for (tok <- t.split(" ", -1)) {
        if (stops(tok)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = tok :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.toSeq
    }.filter(_.length <= TextAnalysis.RakeMaxLen)
    val words = inst.flatMap(p => p.map(w => (w, p.length.toLong)))
    val wscore = words.groupBy(_._1).map { case (w, xs) =>
      w -> (BigInt(xs.map(_._2).sum) * 1000000 / xs.length).toLong
    }
    val expected = inst.groupBy(p => p.mkString(" ")).map { case (ph, xs) =>
      (ph, xs.length.toLong, xs.head.length.toLong,
        xs.head.map(wscore).sum)
    }.toSeq.sortBy(r => (-r._4, r._1)).take(TextAnalysis.RakeTopK)
    assert(got == expected, s"RAKE diverges:\n got=${got.take(5)}\n exp=${expected.take(5)}")
    assert(got.forall(r => r._3 >= 1L && r._3 <= TextAnalysis.RakeMaxLen.toLong))
    assert(got.forall(r => !r._1.split(" ").exists(stops)), "stopword inside a phrase")
    // limit+order must plan as TakeOrdered, not a global sort
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-K not TakeOrdered:\n$p")
  }

  test("x29 TextRank equals a sequential fold over the driver-built graph") {
    val got = TextAnalysis.textRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // driver-side graph construction under the declared policy:
    // stopword-free runs, consecutive-pair edges, undirected distinct
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val stops = TextAnalysis.RakeStopwords.toSet
    val runs = texts.toSeq.flatMap { t =>
      val rs = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.empty[String]
      for (tok <- t.split(" ", -1)) {
        if (stops(tok)) { if (cur.nonEmpty) rs += cur.reverse; cur = Nil }
        else cur = tok :: cur
      }
      if (cur.nonEmpty) rs += cur.reverse
      rs.toSeq
    }
    val nodes = runs.flatten.distinct
    val edges = runs.flatMap(r => r.zip(r.tail))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct
    // sequential integral PageRank — the same fold ClustersPropertySpec
    // proves pageRankOn against, here over string nodes
    val S = 1000000000000L
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (k, vs) => k -> vs.length.toLong }
    val n = nodes.length.toLong
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to TextAnalysis.TextRankIters) {
      val msg = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = nodes.map(u =>
        u -> (15L * (S / n) / 100L + 85L * msg.getOrElse(u, 0L) / 100L)).toMap
    }
    val expected = r.toSeq.sortBy { case (w, rk) => (-rk, w) }
      .take(TextAnalysis.TextRankTopK)
    assert(got == expected, s"TextRank diverges:\n got=${got.take(5)}\n exp=${expected.take(5)}")
    // non-vacuous: connectivity must actually separate ranks
    assert(got.map(_._2).distinct.size > 1, "all ranks equal — vacuous graph")
  }

  test("m10 blur audit: codec TV equals the source-pixel fold; threshold splits") {
    val got = Multimodal.blurAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val w = ((id % 4 + 1) * 8).toInt
      val h = ((id % 3 + 1) * 6).toInt
      val cps = text.codePoints().toArray
      def px(i: Int): Int = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
      var tv = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        if (x < w - 1) tv += math.abs(px(i + 1) - px(i))
        if (y < h - 1) tv += math.abs(px(i + w) - px(i))
      }
      val edges = (w - 1).toLong * h + w.toLong * (h - 1)
      val ppm = tv * 1000000L / (edges * 255L)
      (id, w.toLong, h.toLong, tv, ppm, ppm < Multimodal.BlurPpm)
    }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq,
      s"TV diverges:\n got=${got.take(3).toSeq}\n exp=${expected.take(3).toSeq}")
    // the screen must separate images, not rubber-stamp the corpus
    assert(got.exists(_._6) && got.exists(!_._6),
      s"vacuous blur mask: ${got.count(_._6)}/${got.length}")
  }

  test("m12: detected pitch equals the synthesis truth; kernel is signal-driven") {
    val got = Multimodal.pitchDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // truth from the synthesis rule (the oracle's definition, in Scala)
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.flatMap { id =>
      val nFrames = (id % 4 + 1) * 2
      val amp = 8000L + (id % 7) * 1000L
      (0L until nFrames).map(f => 4L << ((id + f) % 4).toInt)
        .groupBy(identity)
        .map { case (p, fs) => (id, p) -> ((fs.size.toLong, amp)) }
    }.toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expected.keySet).take(3)}")
    // the kernel measures the SIGNAL, not the id rule: a period outside
    // the synthesis family {4,8,16,32} is still recovered exactly
    val odd = Array.tabulate(256)(i =>
      (if (i % 12 < 6) 9000 else -9000).toShort)
    assert(Multimodal.detectPeriod(odd, 0) == ((12L, 9000L)),
      "detector failed on an out-of-family period")
    // and a codec round trip preserves it bit-exactly
    val rt = Multimodal.WavCodec.decodePcm(Multimodal.WavCodec.encodePcm(odd))
    assert(rt.sameElements(odd) && Multimodal.detectPeriod(rt, 0)._1 == 12L)
  }
}
