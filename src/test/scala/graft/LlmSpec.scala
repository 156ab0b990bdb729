package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Envelope
import graft.llm._

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical JSON sorts keys at every level; hash is key-order independent") {
    assert(Envelope.canonicalize("""{"b":1,"a":{"z":2,"y":[1,2]}}""") ==
      """{"a": {"y": [1, 2], "z": 2}, "b": 1}""")
    val h1 = Envelope.canonicalHash("""{"a":1,"b":2}""")
    val h2 = Envelope.canonicalHash("""{"b":2,"a":1}""")
    val h3 = Envelope.canonicalHash("""{"a":1,"b":3}""")
    assert(h1 == h2)
    assert(h1 != h3)
    assert(h1.length == 64 && h1.matches("[0-9a-f]+"))
  }

  test("minhash verified pairs: exact duplicates get jaccard 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content that shares no shingles whatsoever here")
    ).toDF("doc_id", "text")
    val pairs = MinHashDedup.verifiedPairs(docs, "doc_id", "text", k = 8, bucketCap = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash expression matches the shingle/agg formulation on non-BMP text") {
    // emoji are surrogate pairs in UTF-16; code-point windows must agree
    // with the Spark-substring (code point) shingle path
    val docs = Seq(
      (1L, "😀😁😂x😀😁😂y😀"),
      (2L, "plain ascii text of decent length")
    ).toDF("doc_id", "text")
    val viaExpr = docs
      .select($"doc_id", MinHashExpr.minhashSlices($"text", 5, 8).as("mh"))
      .filter($"mh".isNotNull)
      .select($"doc_id" +: (0 until 8).map(i => $"mh" (i).as(s"m$i")): _*)
      .orderBy("doc_id").collect().toSeq
    val viaAgg = MinHashDedup.signatures(docs, "doc_id", "text", 5)
      .orderBy("doc_id").collect().toSeq
    assert(viaExpr == viaAgg)
  }

  test("connected components: chains collapse to min id, singletons self-label") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    // 1-2, 2-3 chain; 4-5 pair; 9 singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L)
    val viaUnionFind = MinHashDedup.connectedComponents(vertices, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUnionFind == expected)
    // force the distributed label-propagation branch (billions-of-pairs path)
    val viaPropagation = MinHashDedup.connectedComponents(vertices, "doc_id",
        pairs, maxDriverPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPropagation == expected)
  }

  test("simhash: equal for identical and token-permuted text, 0 for null-free empty") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val hs = df.select($"doc_id", SimHash.simhash32($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L)) // bag-of-tokens semantics
    assert(hs(1L) != hs(3L))
    assert(hs(1L) >= 0 && hs(1L) <= 0xFFFFFFFFL)
  }

  test("simhash64: top 32 bits equal simhash32 (same votes, wider tail)") {
    val df = Tables.documents(spark, TestSpark.sfDir).limit(50)
    val rows = df.select(
        SimHash.simhash32($"text").as("h32"),
        SimHash.simhash64($"text").as("h64"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(1) >>> 32) == r.getLong(0))
    }
  }

  test("simhash64 hamming pairs: exact duplicates collide at hamming 0, 16-bit bands") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "completely different content about spark engines and parquet")
    ).toDF("doc_id", "text")
    val pairs = SimHash.hammingPairs(df, "doc_id", "text", maxHamming = 3, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
    // only the two fingerprint widths exist; anything else would silently
    // band-misalign (e.g. 48 → an all-zero band)
    assertThrows[IllegalArgumentException](
      SimHash.hammingPairs(df, "doc_id", "text", maxHamming = 3, bits = 48))
  }

  test("simhash survives whole-stage codegen (expression, not UDF)") {
    // a real file scan — local relations get constant-folded before codegen
    val df = Tables.documents(spark, TestSpark.sfDir)
    val plan = df.select(SimHash.simhash32($"text")).queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(plan.contains("*(1) Project") && plan.contains("simhash32"))
    assert(!plan.contains("ScalaUDF"))
  }

  test("dot_decimal latches null when the RUNNING sum transiently overflows decimal(28,12)") {
    // each product ≈ 8.91e15 (16 integer digits, fits); two of them push
    // the running sum past precision 28; the third cancels it back. The
    // stepwise (acc + z).cast(decimal(28,12)) nulls at step 2 and stays
    // null — the fused loop must latch the same way, not report the
    // in-range final value.
    val vecs = Seq((1L, Array(9.9e7, 9.9e7, -9.9e7), Array(9.0e7, 9.0e7, 9.0e7)))
      .toDF("id", "a", "b")
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false") // overflow → null, not error
    try {
      val declarative = aggregate(
        zip_with($"a", $"b", (x, y) =>
          (x.cast("double") * y.cast("double")).cast("decimal(28,12)")),
        lit(0).cast("decimal(28,12)"),
        (acc, z) => (acc + z).cast("decimal(28,12)")).cast("double")
      val r = vecs.select(Similarity.dotDec($"a", $"b").as("native"),
        declarative.as("decl")).collect()(0)
      assert(r.isNullAt(0), "native must latch null on transient overflow")
      assert(r.isNullAt(1), "fixture must actually overflow the stepwise form")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("dot_decimal: bitwise-equal to the declarative decimal(28,12) form") {
    val vecs = Seq(
      (1L, Array(0.1f, -0.27f, 3.5f), Array(1.7f, 0.333f, -2.25f)),
      (2L, Array(1e-7f, 2e-7f, 3e-7f), Array(4e-7f, 5e-7f, 6e-7f)),
      (3L, Array(12345.678f, -9876.5f), Array(0.0001f, 777.77f))
    ).toDF("id", "a", "b")
    val declarative = aggregate(
      zip_with($"a", $"b", (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(28,12)")),
      lit(0).cast("decimal(28,12)"),
      (acc, z) => (acc + z).cast("decimal(28,12)")).cast("double")
    val rows = vecs
      .select(Similarity.dotDec($"a", $"b").as("native"), declarative.as("decl"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine top-k: duplicate vector ranks first with cosine 1") {
    val docs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f)), // duplicate of the query
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(docs, "vec_id", "embedding", $"vec_id" === 0, k = 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[Long]("neighbor_id") == 10L)
    assert(math.abs(out(0).getAs[Double]("cosine") - 1.0) < 1e-9)
    assert(out(1).getAs[Long]("neighbor_id") == 12L)
  }

  test("ivf assignment picks the nearest centroid, ties to lowest id") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)), // centroids
      (100L, Array(1.0f, 1.0f)), (101L, Array(9.0f, 9.0f)),
      (102L, Array(5.0f, 5.0f)) // equidistant → centroid 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfAssign(vecs, "vec_id", "embedding", $"vec_id" < 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100L) == 0L && out(101L) == 1L && out(102L) == 0L)
  }

  test("ivf top-k: probes limit the search to nearest buckets") {
    val vecs = Seq(
      (0L, Array(0.0f, 1.0f)), (1L, Array(1.0f, 0.0f)), // centroids (lowest ids)
      (10L, Array(0.1f, 1.0f)), // bucket 0
      (11L, Array(1.0f, 0.1f)), // bucket 1 — similar to the query too
      (100L, Array(0.2f, 1.0f)) // query, nearest centroid 0
    ).toDF("vec_id", "embedding")
    val q = $"vec_id" === 100
    val one = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 5,
        nProbe = 1, numCentroids = Some(2))
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(one == Set(0L, 10L)) // only bucket 0 scanned: 11 invisible
    val two = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 5,
        nProbe = 2, numCentroids = Some(2))
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(two == Set(0L, 10L, 1L, 11L)) // second probe opens bucket 1
  }

  test("kmeans centroids: one Lloyd round is the exact per-cluster mean") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)), // init (lowest ids)
      (100L, Array(1.0f, 1.0f)), (101L, Array(9.0f, 9.0f)),
      (102L, Array(5.0f, 5.0f)) // equidistant → centroid 0
    ).toDF("vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
        k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cent(0L) == Seq(2.0, 2.0)) // mean of (0,0),(1,1),(5,5)
    assert(cent(1L) == Seq(9.5, 9.5)) // mean of (10,10),(9,9)
    CacheBin.drain()
  }

  test("kmeans-refined ivf: deterministic and recall >= 0.6 vs exact top-k") {
    // 4 well-separated clusters × 12 points, ids interleaved so the
    // lowest-id init spans clusters; deterministic integer jitter
    val pts = (0 until 48).map { i =>
      val c = i % 4
      val v = Array.tabulate(4) { d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 31 + d * 17) % 7) * 0.05f
      }
      (i.toLong, v)
    }
    val vecs = pts.toDF("vec_id", "embedding")
    val mk = () => Similarity.kmeansCentroids(vecs, "vec_id", "embedding",
      k = 6, iters = 2)
    val c1 = mk().collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val c2 = mk().collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(c1 == c2, "Lloyd refinement must be bit-reproducible")

    val q = $"vec_id" < 4
    val exact = Similarity.cosineTopK(vecs, "vec_id", "embedding", q, k = 5)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val approx = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 5,
        nProbe = 2, centroids = Some(mk()))
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    // iterator, not .keys: a Set-mapped recall list dedupes equal values
    val recall = exact.iterator.map { case (id, ex) =>
      (ex & approx.getOrElse(id, Set.empty)).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.6,
      s"recall $recall below threshold; exact=$exact approx=$approx cent=$c1")
    CacheBin.drain()
  }

  test("int8 quantization: known values, exact integer coarse dot, rerank ≈ exact") {
    import graft.llm.Quantize
    // scale = 2/127; q = round-half-up(x/scale): 127, 64 (63.5 rounds up), -127
    val df = Seq((1L, Array(2.0f, 1.0f, -2.0f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val z = Quantize.withInt8(df, "embedding", "z")
      .select($"vec_id", $"z").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(z(1L).getSeq[Int](1) == Seq(127, 64, -127))
    assert(math.abs(z(1L).getDouble(0) - 2.0 / 127) < 1e-15)
    assert(z(2L).getSeq[Int](1) == Seq(0, 0, 0)) // all-zero vector safe

    // quantize-then-rerank recovers the exact top-k on separated clusters
    val pts = (0 until 48).map { i =>
      val c = i % 4
      val v = Array.tabulate(4) { d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 31 + d * 17) % 7) * 0.05f
      }
      (i.toLong, v)
    }
    val vecs = pts.toDF("vec_id", "embedding")
    val q = $"vec_id" < 4
    def keyOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val exact = keyOf(Similarity.cosineTopK(vecs, "vec_id", "embedding", q, k = 5))
    val quant = keyOf(Quantize.quantizedTopK(vecs, "vec_id", "embedding", q, k = 5))
    assert(quant == exact) // identical incl. cosines: rerank is decimal-exact
  }

  test("int8 quantization invariants hold on 200 random vectors") {
    import graft.llm.Quantize
    val rnd = new scala.util.Random(20260812L)
    val data = (0 until 200).map { i =>
      val dim = 1 + rnd.nextInt(16)
      val mag = math.pow(10, rnd.nextInt(6) - 3).toFloat
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * mag))
    }
    val rows = Quantize.withInt8(data.toDF("vec_id", "embedding"), "embedding", "z")
      .select($"vec_id", $"embedding", $"z")
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val scale = r.getStruct(2).getDouble(0)
      val q = r.getStruct(2).getSeq[Int](1)
      assert(scale > 0.0)
      assert(q.forall(x => x >= -127 && x <= 127), s"q out of range: $q")
      // round-half-up: reconstruction within half a quantization step
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + math.ulp(127.0 * scale),
          s"x=$x q=$qi scale=$scale")
      }
      // the max-magnitude element saturates the int8 range exactly
      if (v.exists(_ != 0.0)) assert(q.map(math.abs).max == 127, s"$v -> $q")
    }
  }

  test("ivf index: partitioned write, probed read prunes buckets, matches in-memory path") {
    val pts = (0 until 48).map { i =>
      val c = i % 4
      val v = Array.tabulate(4) { d =>
        (if (d == c) 10.0f else 0.0f) + ((i * 31 + d * 17) % 7) * 0.05f
      }
      (i.toLong, v)
    }
    val vecs = pts.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.ivfIndexWrite(vecs, "vec_id", "embedding", dir, numCentroids = Some(4))
    // one directory per inverted list
    val parts = new java.io.File(dir + "/corpus").listFiles()
      .count(_.getName.startsWith("centroid_id="))
    assert(parts == 4)

    val queries = vecs.filter($"vec_id" < 4)
    val out = Similarity.ivfTopKFromIndex(queries, "vec_id", "embedding", dir,
      k = 5, nProbe = 2)
    val mem = Similarity.ivfTopK(vecs, "vec_id", "embedding", $"vec_id" < 4,
      k = 5, nProbe = 2, numCentroids = Some(4))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    assert(key(out) == key(mem)) // index round-trip changes nothing

    // the probe IN-list prunes at the scan: partition filters present on
    // the corpus read, so unprobed bucket directories are never touched
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid_id"), plan.take(2000))
    CacheBin.drain()
  }

  test("l2 normalize: unit vectors, zero vector stays zero") {
    val df = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.l2Normalize(df, "vec_id", "embedding").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(r(1L).getDouble(2) == 5.0) // the norm rides along in the output
    assert(r(2L).getSeq[Double](1) == Seq(0.0, 0.0)) // tiny-norm guard, no NaN
    // flat form matches elementwise
    val flat = Similarity.l2NormalizeFlat(df, "vec_id", "embedding").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(flat((1L, 1)) == 0.6 && flat((1L, 2)) == 0.8)
  }

  test("curate: the composed pipeline is the intersection of its stages") {
    val s = spark
    val dir = TestSpark.sfDir
    val curated = Queries.curate(s, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val passed = Queries.qualityGate(s, dir).filter($"keep")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val reps = Queries.dedupKeep(s, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val contaminated = Queries.decontaminate(s, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(curated.nonEmpty)
    assert(curated == passed.intersect(reps).diff(contaminated))
    CacheBin.drainAll()
  }

  test("pii scrub: all categories redacted with audit counts, clean text untouched") {
    val docs = Seq(
      (1L, "mail john.doe+x@ex-ample.co or 555-123-4567, ssn 123-45-6789, host 10.0.0.1"),
      (2L, "clean text with numbers 12345 and dots 1.2")
    ).toDF("doc_id", "text")
    val r = TextOps.scrubPii(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    val c1 = r(1L).getString(1)
    assert(c1 == "mail <EMAIL> or <PHONE>, ssn <SSN>, host <IP>")
    assert(r(1L).getLong(2) == 1 && r(1L).getLong(3) == 1) // email, ip
    assert(r(1L).getLong(4) == 1 && r(1L).getLong(5) == 1) // ssn, phone
    assert(r(2L).getString(1) == "clean text with numbers 12345 and dots 1.2")
    assert((2 to 5).forall(r(2L).getLong(_) == 0))
  }

  test("decontamination: gram-overlap counts vs a benchmark, threshold flags") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // all 4 grams shared
      (2L, "one two three four five six seven"), // disjoint
      (3L, "alpha beta gamma nothing else here") // 1 shared gram < threshold
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minOverlap = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 4L))
  }

  test("bloom decontamination: identical to the exact variant (no false negatives)") {
    // unit fixture: same semantics as the exact test above
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma nothing else here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = graft.llm.BloomDecon.decontaminateBloom(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minOverlap = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 4L))

    // real-data identity: bloom FPs are killed by the confirm join, so the
    // two variants must agree row-for-row — even at fpp=0.5 where the
    // prefilter passes half of everything
    val s = spark
    val dir = TestSpark.sfDir
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = rows(Queries.decontaminate(s, dir))
    assert(rows(Queries.decontaminateBloom(s, dir)) == exact)
    val docs = Tables.documents(s, dir)
    val sloppy = graft.llm.BloomDecon.decontaminateBloom(docs, "doc_id", "text",
      docs.filter($"doc_id" < Queries.DeconBenchmarkMaxId), "doc_id", "text",
      n = Queries.DeconN, minOverlap = Queries.DeconMinOverlap, fpp = 0.5)
    assert(rows(sloppy) == exact)
    CacheBin.drainAll()
  }

  test("bloom decontamination plan: might_contain filters the scan side, not post-join") {
    val s = spark
    val dir = TestSpark.sfDir
    val df = Queries.decontaminateBloom(s, dir)
    df.collect() // AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom prefilter must be the native BloomFilterMightContain")
    // the prefilter must sit BELOW the confirm join: everything after the
    // last join operator in the plan tree (= the deepest/scan side in the
    // printed tree) carries the filter
    val joinIdx = plan.lastIndexOf("Join")
    val filterIdx = plan.lastIndexOf("might_contain")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "might_contain must be pushed to the gram stream below the confirm join")
    CacheBin.drainAll()
  }

  test("sequence packing: prefix-sum matches a global window, invariant to partitioning") {
    val docs = Seq(
      (1L, "a b c"), // 3 tokens, start 0,  seq 0
      (2L, "d e"), // 2 tokens, start 3,  seq 0
      (3L, "f g h i j k"), // 6 tokens, start 5,  seq 1 (budget 4)
      (4L, "l"), // 1 token,  start 11, seq 2
      (5L, "m n o p q r s t") // 8 tokens, start 12, seq 3
    ).toDF("doc_id", "text")
    def run(p: Int) = graft.llm.Packing
      .packSequences(docs, "doc_id", "text", budget = 4L, partitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val expected = Seq((1L, 3L, 0L, 0L), (2L, 2L, 3L, 0L), (3L, 6L, 5L, 1L),
      (4L, 1L, 11L, 2L), (5L, 8L, 12L, 3L))
    assert(run(1) == expected) // single partition = the plain running sum
    assert(run(3) == expected) // partition-count invariant (the offsets work)
    assert(run(7) == expected) // more partitions than rows: empties are fine
    CacheBin.drain()
  }

  test("sequence packing: resumeFrom packs an appended batch without re-reading the old") {
    val all = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j k"),
      (4L, "l"), (5L, "m n o p q r s t")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val whole = rows(graft.llm.Packing.packSequences(all, "doc_id", "text", budget = 4L))
    val first = all.filter($"doc_id" <= 3)
    val second = all.filter($"doc_id" > 3)
    val firstPacked = graft.llm.Packing.packSequences(first, "doc_id", "text", budget = 4L)
    val consumed = firstPacked.agg(sum("n_tokens")).collect()(0).getLong(0)
    val resumed = rows(graft.llm.Packing.packSequences(second, "doc_id", "text",
      budget = 4L, resumeFrom = consumed))
    assert(rows(firstPacked) ++ resumed == whole)
    CacheBin.drain()
  }

  test("sequence packing on the corpus: every offset equals the window cumsum") {
    val s = spark
    val dir = TestSpark.sfDir
    val docs = Tables.documents(s, dir)
    val packed = Queries.packSequences(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // oracle twin computed in-Spark with an explicit global window (fine
    // at test scale; the operator exists to avoid exactly this plan)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val oracle = docs.select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed.keySet == oracle.keySet)
    oracle.foreach { case (id, (n, start)) =>
      val (pn, pstart, pseq) = packed(id)
      assert(pn == n && pstart == start, s"doc $id")
      assert(pseq == start / Queries.PackBudget, s"doc $id seq")
    }
    CacheBin.drain()
  }

  test("label coherence: clean clusters sit on the diagonal, an outlier crosses") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f), 0), // label-0 cluster near origin
      (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(10.0f, 10.0f), 1), // label-1 cluster far away
      (4L, Array(10.1f, 10.0f), 1),
      (5L, Array(9.9f, 10.1f), 0) // mislabeled: sits in cluster 1
    ).toDF("vec_id", "embedding", "label")
    val got = graft.llm.Similarity.labelCoherence(vecs, "vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // centroid of label 0 is dragged toward cluster 1 by the outlier, but
    // the two clean label-0 points stay nearest their own centroid; the
    // mislabeled point lands on label 1's centroid → off-diagonal cell
    assert(got((0L, 0L)) == 2L)
    assert(got((1L, 1L)) == 2L)
    assert(got((0L, 1L)) == 1L)
    assert(got.values.sum == 5L)
  }

  test("ngram containment: sub-document duplication scores high where jaccard stays low") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // 2 grams, both inside doc 2
      (2L, "alpha beta gamma delta lots of extra words beyond the quote here now")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = graft.llm.MinHashDedup.ngramOverlap(docs, "doc_id", "text", 3, pairs)
      .collect()(0)
    assert(r.getAs[Double]("containment_a") == 1.0) // doc 1 fully inside doc 2
    assert(r.getAs[Double]("jaccard") < 0.2) // resemblance alone misses it
    assert(r.getAs[Double]("containment_b") < 0.2)
    // jaccard column identical to the resemblance-only query
    val j = graft.llm.MinHashDedup.ngramJaccard(docs, "doc_id", "text", 3, pairs)
      .collect()(0).getAs[Double]("jaccard")
    assert(j == r.getAs[Double]("jaccard"))
  }

  test("lang confusion: cells sum to the corpus and agree with per-doc predictions") {
    val s = spark
    val dir = TestSpark.sfDir
    val docs = Tables.documents(s, dir)
    val conf = Queries.langConfusion(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.values.sum == docs.count())
    // cross-check one cell against the per-doc query it must agree with
    val perDoc = Queries.langId(s, dir).select("doc_id", "pred_lang")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == perDoc)
  }

  test("vocab top-k: occurrence + doc frequencies, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b b c"), // a:1 b:2 c:1
      (2L, "b c c"), // b:1 c:2
      (3L, "a") // a:1
    ).toDF("doc_id", "text")
    val got = graft.llm.TextOps.vocabTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // b and c both have 3 occurrences → tie breaks on the token string
    assert(got == Seq(("b", 3L, 2L), ("c", 3L, 2L)))
  }

  test("vocab top-k plan: per-partition heaps, not a global vocabulary sort") {
    val plan = Queries.vocabTopK(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject, got:\n$plan")
  }

  test("shard writer: token-balanced round-robin on seq_id, data-complete") {
    val s = spark
    val dir = TestSpark.sfDir
    val packed = Queries.packSequences(s, dir)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    graft.llm.Packing.writeShards(packed, out, nShards = 4)
    val back = s.read.parquet(out)
    // complete and intact
    assert(back.count() == packed.count())
    assert(back.select("doc_id").distinct().count()
      == packed.select("doc_id").distinct().count())
    // balanced: per-shard token sums within 2 sequence budgets of each
    // other (round-robin on budget-sized sequences; boundary docs overhang)
    val sums = back.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(_.getAs[Long]("t"))
    assert(sums.length == 4)
    assert(sums.max - sums.min <= 2 * Queries.PackBudget,
      s"shard skew ${sums.max - sums.min} exceeds 2x budget: ${sums.toSeq}")
    CacheBin.drain()
  }

  test("hash split: deterministic, salt-sensitive, proportional, bucket-consistent") {
    val df = (0L until 1000L).toSeq.toDF("doc_id")
    def run(salt: String) = TextOps.hashSplit(df, "doc_id", salt, 90).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("bucket"), r.getAs[String]("split"))).toMap
    val s1 = run("s1")
    assert(s1 == run("s1")) // reproducible
    assert(s1 != run("s2")) // a new salt reshuffles
    assert(s1.values.forall { case (b, _) => b >= 0 && b < 100 })
    assert(s1.values.forall { case (b, s) => (b < 90) == (s == "train") })
    val trainFrac = s1.values.count(_._2 == "train").toDouble / s1.size
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("SessionMemo: builds once per key, lineage-truncated result, drainAll evicts") {
    var builds = 0
    def build() = { builds += 1; Seq((1L, "x")).toDF("id", "t") }
    val a = SessionMemo.cached(spark, "memo-spec-k1")(build())
    val b = SessionMemo.cached(spark, "memo-spec-k1")(build())
    assert(builds == 1 && (a eq b))
    // the memo hands out a lineage-truncated (checkpointed) frame: every
    // consumer analyzes a leaf, not the build pipeline
    assert(a.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.nonEmpty,
      a.queryExecution.analyzed.toString)
    assert(a.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a builder that persisted (+ materialized) its RESULT frame is
    // released as soon as the checkpoint is materialized — the
    // checkpoint now holds the rows, and nothing else would ever
    // unpersist the builder's cache
    val pre = Seq((2L, "y")).toDF("id", "t").persist()
    pre.count()
    val c = SessionMemo.cached(spark, "memo-spec-k2")(pre)
    assert(!(c eq pre))
    assert(pre.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(c.collect().map(_.getLong(0)).toSeq == Seq(2L))
    CacheBin.drainAll()
    val d = SessionMemo.cached(spark, "memo-spec-k1")(build())
    assert(builds == 2 && !(a eq d)) // evicted: rebuilt fresh
    CacheBin.drainAll()
  }

  test("SessionMemo.buildSeconds: nested builds bill self time only (additive decomposition)") {
    // the curate-v3/v4 shape: a parent memo whose builder triggers a child
    // memo — the child's wall time must land on the CHILD key alone, so
    // sum(memo_sec) never double-bills nested pipelines
    CacheBin.drainAll()
    SessionMemo.cached(spark, "nest-parent") {
      Thread.sleep(150)
      val child = SessionMemo.cached(spark, "nest-child") {
        Thread.sleep(400)
        Seq((1L, "c")).toDF("id", "t")
      }
      child.select("id", "t")
    }
    val bs = SessionMemo.buildSeconds
    assert(bs("nest-child") >= 0.4, s"child undertimed: ${bs("nest-child")}")
    // parent self time excludes the child's 400ms sleep entirely
    assert(bs("nest-parent") < 0.4,
      s"parent double-billed the child build: ${bs("nest-parent")}")
    CacheBin.drainAll()
  }

  test("stratified sample: per-stratum cap, partition-independent, re-saltable, map-side limit") {
    val docs = Tables.documents(spark, TestSpark.sfDir).select("doc_id", "source")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    val a = TextOps.stratifiedSample(docs, "doc_id", "source", 5, "s1")
    assert(a.groupBy("source").count().collect().forall(_.getLong(1) <= 5))
    // identical under a different physical partitioning — the determinism
    // contract random sampling loses
    val b = TextOps.stratifiedSample(docs.repartition(7), "doc_id", "source", 5, "s1")
    assert(key(a) == key(b))
    // a fresh salt draws a different sample
    val c = TextOps.stratifiedSample(docs, "doc_id", "source", 5, "s2")
    assert(key(c).map(_._1) != key(a).map(_._1))
    // the rank limit must apply BEFORE the exchange (WindowGroupLimit), so
    // the shuffle never carries whole strata
    assert(a.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("unicode normalize: NFC composes, NFKC folds compatibility, sanitize strips controls") {
    val rows = Seq(
      (0L, "cafe\u0301"),      // decomposed acute: composes to \u00e9
      (1L, "caf\u00e9"),       // already NFC: unchanged
      (2L, "\ufb01le"),        // fi ligature: NFC keeps, NFKC folds to "fi"
      (3L, "ab\u0007c\u0000"), // stray controls: sanitized out
      (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = rows.select($"id", UnicodeNorm.nfc($"t").as("nfc"),
        UnicodeNorm.nfkc($"t").as("nfkc"), UnicodeNorm.sanitize($"t").as("san"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out(0L)._1 == "caf\u00e9" && out(1L)._1 == "caf\u00e9")
    assert(out(2L)._1 == "\ufb01le" && out(2L)._2 == "file")
    assert(out(3L)._3 == "abc")
    assert(out(4L)._1 == null && out(4L)._3 == null)
    // idempotent: a second pass is the identity
    val twice = rows.filter($"t".isNotNull)
      .select(UnicodeNorm.nfc(UnicodeNorm.nfc($"t")) === UnicodeNorm.nfc($"t"))
      .collect().forall(_.getBoolean(0))
    assert(twice)
  }

  test("unicode normalize survives whole-stage codegen (expression, not UDF)") {
    // a real file scan — local relations get constant-folded before codegen
    val df = Tables.documents(spark, TestSpark.sfDir)
    val plan = df.select(UnicodeNorm.nfc($"text")).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("nfc_normalize"))
    assert(!plan.contains("ScalaUDF"))
  }

  test("dataset manifest fingerprint: partition-invariant, flips on any content change") {
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long = df
      .select(conv(substring(sha2(concat($"doc_id".cast("string"), lit(":"),
        $"text"), 256), 1, 15), 16, 10).cast("long").as("fp"))
      .agg(expr("bit_xor(fp)")).head.getLong(0)
    val base = (1L to 6L).map(i => (i, s"document number $i body")).toDF("doc_id", "text")
    val oneEdit = (1L to 6L).map(i =>
      (i, if (i == 4L) "document number 4 bodY" else s"document number $i body"))
      .toDF("doc_id", "text")
    assert(fingerprint(base) == fingerprint(base.repartition(7))) // XOR: order-free
    assert(fingerprint(base) != fingerprint(oneEdit))             // 1-char change flips
    assert(fingerprint(base) != fingerprint(base.limit(5)))       // a missing doc flips
  }

  test("curate v4: v3 survivors ∧ classifier keep, contiguous band-major positions") {
    val v4 = Queries.curateV4(spark, TestSpark.sfDir).collect()
    val v3Ids = Queries.curateV3(spark, TestSpark.sfDir).collect()
      .map(_.getLong(0)).toSet
    val keepIds = Queries.classifierScores(spark, TestSpark.sfDir)
      .filter(col("pred_keep")).collect().map(_.getLong(0)).toSet
    assert(v4.map(_.getLong(0)).toSet == (v3Ids & keepIds))
    // absolute order: positions are 0..n-1 with band nondecreasing
    val byPos = v4.sortBy(_.getLong(5))
    assert(byPos.map(_.getLong(5)).toSeq == (0L until v4.length).toSeq)
    assert(byPos.map(_.getInt(4)).toSeq == byPos.map(_.getInt(4)).toSeq.sorted)
    CacheBin.drainAll()
  }

  test("binary codes: partition-invariant, duplicates collide, bits match driver recompute") {
    val base = (0L to 19L).map(i =>
      (i, Array.tabulate(8)(k => ((i * 7 + k * 3) % 11 - 5).toFloat)))
    val vecs = base :+ (100L, base.head._2) // exact duplicate of vec 0
    val df = vecs.toDF("vec_id", "embedding")
    val codes = Similarity.binaryCodes(df, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codes2 = Similarity.binaryCodes(df.repartition(5), "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes == codes2)
    assert(codes(0L) == codes(100L)) // identical vectors → identical codes
    // bit-level check against a direct driver-side recompute of vec 1
    val v = base(1)._2.map(_.toDouble)
    val expected = (0 until 64).foldLeft(0L) { (acc, j) =>
      val dot = (0 until 8).map(i => Similarity.hyperplaneSign(j, i) * v(i)).sum
      if (dot > 0) acc | (1L << (63 - j)) else acc
    }
    assert(codes(1L) == expected)
  }

  test("source entropy: uniform hits ln(k), constant hits 0, ttr exact") {
    val docs = Seq(
      ("uni", "a b c d"),        // 4 distinct tokens, once each: H = ln 4
      ("const", "x x x x x"),    // one type: H = 0
      ("mix", "a a b")           // H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    ).toDF("source", "text")
    val out = TextOps.sourceEntropy(docs, "source", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(math.abs(out("uni")._3 - math.log(4.0)) < 1e-8)
    assert(out("const")._3 == 0.0 && out("const")._4 == 0.2)
    val hMix = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(out("mix")._3 - hMix) < 1e-8)
    assert(out("uni") == ((4L, 4L, out("uni")._3, 1.0)))
  }

  test("classifier: separable data fits to 100%, weights partition-invariant") {
    // deterministic separable set: y = (x1 > 0), x2 pure noise-ish
    val rows = (0 until 200).map { i =>
      val x1 = (i % 21 - 10) / 10.0
      (i.toLong, x1, ((i * 7) % 13 - 6) / 6.0, if (x1 > 0) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val w = Classifier.trainLogistic(df, Seq("x1", "x2"), "y", steps = 16, lr = 2.0)
    // partition-invariant: the per-term 1e-9 floor + BIGINT gradient sums
    // make the fit independent of physical layout (float sums are not)
    val w2 = Classifier.trainLogistic(df.repartition(7), Seq("x1", "x2"), "y",
      steps = 16, lr = 2.0)
    assert(w.toSeq == w2.toSeq)
    assert(w(1) > 1.0) // the separating direction dominates
    val (_, keep) = Classifier.scoreCols(w, Seq("x1", "x2"))
    val acc = df.select((keep === (col("y") === 1.0)).cast("int")).collect()
      .map(_.getInt(0)).sum / 200.0
    assert(acc >= 0.95, s"separable fit accuracy $acc")
  }

  test("classifier on the corpus: distills the quality gate above the majority baseline") {
    val scores = Queries.classifierScores(spark, TestSpark.sfDir).collect()
    val n = scores.length.toDouble
    val acc = scores.count(r => r.getBoolean(2) == r.getBoolean(3)) / n
    val majority = math.max(scores.count(_.getBoolean(3)) / n,
      1.0 - scores.count(_.getBoolean(3)) / n)
    assert(acc > majority + 0.1, s"acc $acc vs majority $majority")
    // a real model, not a constant: both decisions appear
    assert(scores.exists(_.getBoolean(2)) && scores.exists(!_.getBoolean(2)))
  }

  test("curriculum order: decomposed position equals a global sort, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sfDir).select("doc_id")
    val band = (col("doc_id") % 3).cast("int")
    val out = TextOps.curriculumOrder(docs.repartition(11), "doc_id", band, "cur")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the reference order computed the naive way: one global window
    val key = sha2(concat(col("doc_id").cast("string"), lit("cur")), 256)
    val ref = docs.select(col("doc_id"), band.as("b"), key.as("k"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("b"), col("k"), col("doc_id"))).cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == ref)
    // and the engine's corpus-scale window must be hash-partitioned by
    // (band, shard) — the only single-partition stage is the bands×256
    // offset rollup (metadata-scale, like the packing offsets)
    val plan = Queries.curriculumOrder(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(band"))
  }

  test("cluster sample: per-cell quota with every occupied cell represented") {
    // two tight, well-separated clusters around the two lowest-id vectors
    // (the IVF codebook init), deliberately unbalanced: 6 vs 2 members
    val vecs = (Seq((0L, Array(0f, 0f)), (1L, Array(100f, 100f))) ++
      (2L to 7L).map(i => (i, Array(i * 0.1f, i * 0.1f))) ++
      Seq((8L, Array(99f, 99f)), (9L, Array(101f, 101f)))).toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssignTo(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" < 2)).select($"vec_id", $"centroid_id")
    val out = TextOps.stratifiedSample(assigned, "vec_id", "centroid_id", 3, "cs")
      .collect().map(r => r.getLong(1) -> r.getLong(0))
    val perCell = out.groupBy(_._1).view.mapValues(_.length).toMap
    // dense cell capped at the quota; sparse cell fully represented —
    // the diversity property a proportional sample would not give
    assert(perCell(0L) == 3 && perCell(1L) == 3)
    assert(out.filter(_._1 == 1L).map(_._2).toSet.subsetOf(Set(1L, 8L, 9L)))
  }

  test("stratified sample: sampled docs survive corpus shrinkage (ranks only improve)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map(i => (i.toLong, s"s${rnd.nextInt(5)}"))
    val sampled = TextOps.stratifiedSample(rows.toDF("doc_id", "source"),
      "doc_id", "source", 8, "st").collect().map(_.getLong(0)).toSet
    // drop ~half of the NON-sampled docs: every sampled doc must still be
    // sampled (a fixed hash rank can only improve as competitors leave) —
    // the curation-rerun stability a random() sample cannot give
    val keep = rows.filter { case (id, _) => sampled(id) || rnd.nextBoolean() }
    val sampled2 = TextOps.stratifiedSample(keep.toDF("doc_id", "source"),
      "doc_id", "source", 8, "st").collect().map(_.getLong(0)).toSet
    assert(sampled.subsetOf(sampled2))
  }

  test("SessionMemo.once: runs per key once, re-arms after drainAll") {
    var runs = 0
    SessionMemo.once(spark, "once-spec-k1") { runs += 1 }
    SessionMemo.once(spark, "once-spec-k1") { runs += 1 }
    SessionMemo.once(spark, "once-spec-k2") { runs += 1 }
    assert(runs == 2) // one per distinct key
    CacheBin.drainAll()
    SessionMemo.once(spark, "once-spec-k1") { runs += 1 }
    assert(runs == 3) // drainAll re-arms (actions must be overwrite-safe)
  }

  test("verifiedPairsShared: later consumers get the SAME memoized frame, keyed by params") {
    val docs = Seq(
      (1L, "the same twenty-two characters"),
      (2L, "the same twenty-two characters"),
      (3L, "completely different text here!")).toDF("doc_id", "text")
    val a = MinHashDedup.verifiedPairsShared(docs, "corpus1", "doc_id", "text", 16, 50)
    val b = MinHashDedup.verifiedPairsShared(docs, "corpus1", "doc_id", "text", 16, 50)
    assert(a eq b, "same key must return the identical DataFrame instance")
    val c = MinHashDedup.verifiedPairsShared(docs, "corpus2", "doc_id", "text", 16, 50)
    assert(!(a eq c), "a different corpus key must not hit the memo")
    CacheBin.drainAll() // also clears the memo via the registered hook
    val d = MinHashDedup.verifiedPairsShared(docs, "corpus1", "doc_id", "text", 16, 50)
    assert(!(a eq d), "drainAll must evict so a new pipeline is built")
    CacheBin.drainAll()
  }

  test("repetition stats: known gram counts, repeated text saturates the ratios") {
    val docs = Seq(
      (1L, "a b c a b c a b"),   // grams: abc,bca,cab,abc,bca,cab → 6 total, 3 uniq
      (2L, "w x y z"),           // 2 grams, both unique
      (3L, "s t")                // too short: dropped
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L))
    assert(r(1L).getAs[Long]("n_grams") == 6 && r(1L).getAs[Long]("n_uniq_grams") == 3)
    assert(r(1L).getAs[Double]("dup_ratio") == 0.5)
    assert(r(1L).getAs[Double]("top_gram_ratio") == 2.0 / 6)
    assert(r(2L).getAs[Double]("dup_ratio") == 0.0)
    assert(r(2L).getAs[Double]("top_gram_ratio") == 0.5)
  }

  test("quality gate: envelope thresholds keep/drop with composed reasons") {
    val docs = Seq(
      (1L, "the cat sat on a mat with the dog and a bird nearby watching it"), // keep (14 tokens... adjust below)
      (2L, "word"), // too_short, low_stopword_ratio
      (3L, "x " * 30 + "x") // repetitive: low diversity, no stopwords
    ).toDF("doc_id", "text")
    val g = TextOps.qualityGate(docs, "doc_id", "text",
        minTokens = 5, maxTokens = 50, minStopRatio = 0.05, minUniqRatio = 0.3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getAs[Boolean]("keep"))
    assert(g(1L).getAs[String]("drop_reasons") == "")
    assert(!g(2L).getAs[Boolean]("keep"))
    assert(g(2L).getAs[String]("drop_reasons")
      == "too_short;low_stopword_ratio")
    assert(!g(3L).getAs[Boolean]("keep"))
    assert(g(3L).getAs[String]("drop_reasons")
      == "low_stopword_ratio;low_lexical_diversity")
  }

  test("text stats: counts and ratios on a known sentence") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextOps.textStats(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_stopwords") == 2)
    assert(r.getAs[Long]("n_uniq_tokens") == 5)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-12)
    assert(r.getAs[String]("pred_lang") == "en")
  }

  test("n-gram language ID picks the dominant trigram profile") {
    val df = Seq(
      (1L, "the king and the queen are singing of the nation"),
      (2L, "der schneider und der schuler sind einig und ich auch"),
      (3L, "les etudiants naient que des questions anciennes et des idees")
    ).toDF("doc_id", "text")
    val out = TextOps.langIdNgram(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("token counts: whitespace vs BPE-ish pretokenization") {
    val df = Seq((1L, "I'll pay $42 now")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_ws_tokens") == 4)
    // I | 'll | ␣pay | ␣$ | 42 | ␣now
    assert(r.getAs[Long]("n_bpeish_tokens") == 6)
    assert(r.getAs[Long]("n_chars") == 16)
  }

  test("winnow fingerprints: duplicates agree, short docs drop out") {
    val txt = "the quick brown fox jumps over the lazy dog"
    val docs = Seq((1L, txt), (2L, txt), (3L, "a completely different sentence here"),
      (4L, "tiny")).toDF("doc_id", "text")
    val out = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_fp"), r.getAs[Long]("fp_min"), r.getAs[Long]("fp_sum"))).toMap
    assert(!out.contains(4L)) // shorter than k+w-1
    assert(out(1L) == out(2L)) // identical text → identical fingerprint set
    assert(out(1L) != out(3L))
    assert(out(1L)._1 > 0)
  }

  test("fingerprint is invariant to case/punctuation/extra whitespace") {
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
    val fp = TextOps.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("fingerprint")).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("ngram jaccard: identical docs 1.0, disjoint docs 0.0") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = MinHashDedup.ngramJaccard(docs, "doc_id", "text", 3, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((2L, 3L)) == 0.0)
  }

  test("simhash hamming pairs: identical docs pair at distance 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated words here indeed friend")
    ).toDF("doc_id", "text")
    val out = SimHash.hammingPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 0)
    assert(!out.contains((1L, 3L)))
  }

  test("cosine near-dup: duplicate vectors in same block found, cross-block excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), // lowest id → the single centroid
      (10L, Array(0.9f, 0.1f), 1), (11L, Array(0.9f, 0.1f), 1), // same block dup
      (12L, Array(0.9f, 0.1f), 2) // other block — excluded by blocking
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.cosineNearDup(vecs, "vec_id", "embedding", "label",
        threshold = 0.99, numCentroids = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((10L, 11L)))
    assert(!out.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("cosine near-dup: a mega-block over blockCap is dropped, small blocks survive") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(1.0f, 0.0f), 1), // block 1: three identical vecs > cap
      (10L, Array(0.0f, 1.0f), 2), (11L, Array(0.0f, 1.0f), 2) // block 2: pair
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.cosineNearDup(vecs, "vec_id", "embedding", "label",
        threshold = 0.99, numCentroids = Some(1), blockCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 11L))) // mega-block contributed no pairs
  }

  test("multimodal resize + frame sampling: shapes and determinism") {
    val docs = Seq((1L, "0123456789abcdef0123456789abcdef"), (2L, "xy"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaColumn(docs, "doc_id", "text")
    val rs = Multimodal.resize(media, 128, 128).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    assert(rs(1L).length == 128 * 128 / 64 && rs(2L).length == rs(1L).length)
    assert(rs(1L).toSeq == Multimodal.resize(media, 128, 128).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap.apply(1L).toSeq)
    // 32-byte payload, 8-byte frames, stride 2 → frames 0 and 2
    val fr = Multimodal.sampleFrames(media.filter($"doc_id" === 1), 8, 2).collect()
    assert(fr.map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    assert(new String(fr.find(_.getInt(1) == 0).get.getAs[Array[Byte]]("frame"), "UTF-8")
      == "01234567")
  }

  test("multimodal: real PNG decodes via imageio — true dims, pixel checksum, real resize") {
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, x * 50 + y * 65536)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    var cs = 0L // expected: row-major ARGB checksum of the source pixels
    for (y <- 0 until 3; x <- 0 until 5) cs = cs * 31 + img.getRGB(x, y)

    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getInt(1) == 5 && f(1L).getInt(2) == 3) // true dimensions
    assert(f(1L).getLong(3) == cs) // PNG is lossless: decoded pixels match
    assert(f(1L).getString(4) == "imageio")
    assert(f(2L).getString(4) == "opaque") // magic sniff routes non-images

    val rs = Multimodal.resize(media, 4, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("media")).toMap
    val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rs(1L)))
    assert(rimg.getWidth == 4 && rimg.getHeight == 4) // real scale, PNG out
    assert(Multimodal.looksLikeImage(rs(1L)))
    assert(rs(2L).length == 1) // non-image keeps the fallback contract

    // corrupt body behind a valid magic: ImageIO throws internally — the
    // row must fall back to the fake kernel, not fail the task
    val corrupt = png.take(8) ++ Array.fill[Byte](16)(0x7f)
    val cm = Seq((9L, corrupt)).toDF("doc_id", "media")
    val cf = Multimodal.extractFeatures(cm).collect()(0)
    assert(cf.getString(4) == "opaque")
    assert(Multimodal.resize(cm, 4, 4).collect()(0)
      .getAs[Array[Byte]]("media").length == 1) // fakeResize shape
  }

  test("media quality gate: real dims gate images, fallback dims gate the rest") {
    // a real 5×3 PNG must be dropped by a 16×16 minimum with BOTH dim
    // reasons — proof the gate reads DECODED dimensions, not payload bytes
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq((1L, png), (2L, ("x" * 100).getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val g = Multimodal.mediaQualityGate(media, minW = 16, minH = 16,
      minBytes = 1L, maxBytes = 1L << 20).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getString(4) == "imageio" && !g(1L).getBoolean(5))
    assert(g(1L).getString(6) == "too_narrow;too_flat")
    // fallback: width = 64 + 'x'%64 = 120, height = 64 + 100%64 = 100 → keep
    assert(g(2L).getString(4) == "opaque" && g(2L).getBoolean(5))
    assert(g(2L).getInt(1) == 120 && g(2L).getInt(2) == 100)
    assert(g(2L).getString(6) == "")

    // the registered query splits the corpus meaningfully (both outcomes)
    val q = Queries.mediaGate(spark, TestSpark.sfDir)
      .groupBy("keep").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(q.keySet == Set(true, false) && q.values.forall(_ > 0))
  }

  test("multimodal: real WAV decodes via javasound — format, frames, PCM checksum") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array.tabulate[Byte](200)(i => ((i * 37) % 251).toByte) // 100 frames
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 100)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    var cs = 0L
    pcm.foreach(b => cs = cs * 31 + java.lang.Byte.toUnsignedInt(b))

    val media = Seq((1L, wav), (2L, "not audio at all!".getBytes("UTF-8")),
        (3L, "RIFFxxxxWAVE".getBytes("UTF-8") ++ Array.fill[Byte](8)(1)))
      .toDF("doc_id", "media")
    val f = Multimodal.audioFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getDouble(1) == 8000.0 && f(1L).getInt(2) == 1)
    assert(f(1L).getInt(3) == 16 && f(1L).getLong(4) == 100L)
    assert(f(1L).getLong(5) == cs) // PCM is lossless: bytes round-trip
    assert(f(1L).getString(6) == "javasound")
    assert(f(2L).getString(6) == "opaque") // sniff routes non-audio
    assert(f(3L).getString(6) == "opaque") // corrupt body behind valid magic
  }

  test("incremental dedup: old evicts new, earlier new evicts later, old never evicted") {
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val twin = "entirely novel duplicated sentence appearing twice in the new batch only"
    val docs = Seq(
      (10L, dup),                                                        // old
      (11L, "some other unrelated old content nothing shares here at"),  // old
      (14L, dup),   // new: near-dups OLD 10 → dropped
      (19L, twin),  // new: first of a new-batch twin pair → kept
      (24L, twin),  // new: duplicates EARLIER new 19 → dropped
      (29L, "completely unique fresh document with zero overlap anywhere")
    ).toDF("doc_id", "text")
    val out = MinHashDedup.incrementalNewKeep(docs, "doc_id", "text",
        k = 8, bucketCap = 50, isNew = col("doc_id") % 5 === 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(14L, 19L, 24L, 29L)) // one row per NEW doc only
    assert(out(14L) == (1L, false)) // evicted by old 10
    assert(out(19L) == (0L, true))  // later sibling 24 does NOT evict it
    assert(out(24L) == (1L, false)) // evicted by earlier new 19
    assert(out(29L) == (0L, true))
  }

  test("incremental dedup agrees with the full sweep's verified pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val isNew = col("doc_id") % 5 === 4
    val full = MinHashDedup.verifiedPairs(docs, "doc_id", "text", k = 16, bucketCap = 50)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // derive the expected decisions from the full pair set
    val newIds = docs.filter(isNew).select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedDrops = full.flatMap { case (a, b) =>
      Seq(if (newIds(b)) Some(b) else None,
          if (newIds(a) && !newIds(b)) Some(a) else None).flatten
    }
    val out = MinHashDedup.incrementalNewKeep(docs, "doc_id", "text",
        k = 16, bucketCap = 50, isNew = isNew, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.keySet == newIds)
    assert(out.filter(!_._2).keySet == expectedDrops)
  }

  test("incremental dedup from a stored signature table equals the recomputed path") {
    val dir = java.nio.file.Files.createTempDirectory("sigstore").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val isNew = col("doc_id") % 5 === 4
    // the previous run materializes OLD signatures; today's run reads them
    MinHashDedup.signatures(docs.filter(!isNew), "doc_id", "text", k = 16)
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val fromStore = MinHashDedup.incrementalNewKeep(docs, "doc_id", "text",
        k = 16, bucketCap = 50, isNew = isNew, threshold = 0.5,
        storedSigs = Some(spark.read.parquet(s"$dir/sigs")))
      .collect().toSet
    val recomputed = MinHashDedup.incrementalNewKeep(docs, "doc_id", "text",
        k = 16, bucketCap = 50, isNew = isNew, threshold = 0.5)
      .collect().toSet
    assert(fromStore == recomputed && fromStore.nonEmpty)
  }

  test("distinctive terms: lowest-df token wins, tf then token break ties") {
    val docs = Seq(
      (1L, "common common rare"),        // 'rare' df=1 beats 'common' df=3
      (2L, "common zz zz aa"),           // df-1 tie aa/zz: tf 2 beats 1 → zz
      (3L, "common only")                // 'only' df=1
    ).toDF("doc_id", "text")
    val out = TextOps.distinctiveTerms(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ("rare", 1L, 1L))
    assert(out(2L) == ("zz", 2L, 1L))
    assert(out(3L) == ("only", 1L, 1L))
  }

  test("shared IVF assignment: memoized path is identical to the standalone one") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val n = Tables.rowCount(spark, dir, "embeddings")
    // standalone (no `assigned`) formulations — the pre-memo shapes
    val topkAlone = Similarity.ivfTopK(emb, "vec_id", "embedding",
      isQuery = col("vec_id") < 5, k = 10, nProbe = 3, corpusCount = Some(n))
    val nearAlone = Similarity.cosineNearDup(emb, "vec_id", "embedding",
      "label", threshold = 0.2, corpusCount = Some(n))
    // memoized-assignment paths, as the registered queries run them
    val topkShared = Queries.ivfTopK(spark, dir)
    val nearShared = Queries.embedNearDup(spark, dir)
    assert(topkShared.collect().toSet == topkAlone.collect().toSet)
    assert(nearShared.collect().toSet == nearAlone.collect().toSet)
  }

  test("label drift: identical halves drift zero, a shifted label moves") {
    val rows = Seq(
      // label 1: even and odd halves hold the same two vectors → drift 0
      (0L, 1L, Seq(1.0f, 2.0f)), (1L, 1L, Seq(1.0f, 2.0f)),
      (2L, 1L, Seq(3.0f, 0.0f)), (3L, 1L, Seq(3.0f, 0.0f)),
      // label 2: odd (new) half shifted by (1, 0) → drift² = 1
      (4L, 2L, Seq(0.0f, 0.0f)), (5L, 2L, Seq(1.0f, 0.0f)),
      (6L, 2L, Seq(2.0f, 2.0f)), (7L, 2L, Seq(3.0f, 2.0f))
    ).toDF("vec_id", "label", "embedding")
    val d = Similarity.labelDrift(rows, "vec_id", "embedding", "label",
        isNew = col("vec_id") % 2 === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(d(1L) == (2L, 2L, 0.0))
    // old mean (1,1), new mean (2,1) → drift² = 1; counts 2/2
    assert(d(2L) == (2L, 2L, 1.0))
  }

  test("token-budget sample: budget respected per stratum, rank limit is map-side") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.tokenBudgetSample(spark, dir)
    val rows = out.collect()
    // every stratum's cumulative take fits the budget, and the next doc
    // in hash order would NOT have fit (maximality), per source
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.map(_.getLong(3)).max)
      assert(rs.map(_.getLong(3)).max <= Queries.SampleTokenBudget)
    }
    // a meaningful sample: strictly fewer docs than the corpus
    assert(rows.length < Tables.documents(spark, dir).count())
    // the rank cutoff applies before the shuffle (WindowGroupLimit)
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("winnow pairs surface shared regions and drop over-shared fingerprints") {
    val region = "unmistakably shared fragment of text here"
    val docs = Seq(
      (1L, s"alpha prefix $region omega suffix one"),
      (2L, s"totally different framing yet $region appears"),
      (3L, "no overlap with anything else in this corpus at all times")
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs, "doc_id", "text",
        k = 8, w = 4, minShared = 3L, bucketCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 3L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // a fingerprint shared by MORE than bucketCap docs must be dropped:
    // with cap 2, the 3-way shared region fans out no pairs at all
    val many = Seq(
      (1L, s"aa $region zz"), (2L, s"bb $region yy"), (3L, s"cc $region xx")
    ).toDF("doc_id", "text")
    val capped = TextOps.winnowPairs(many, "doc_id", "text",
      k = 8, w = 4, minShared = 1L, bucketCap = 2)
    val uncapped = TextOps.winnowPairs(many, "doc_id", "text",
      k = 8, w = 4, minShared = 1L, bucketCap = 50)
    assert(capped.count() == 0 && uncapped.count() == 3)
    // the coverage audit makes that silent zero observable: under cap 2
    // the 3-way-shared fingerprints read as hot (pair_coverage sinks),
    // under cap 50 the same mass is pairable — and the occurrence ledger
    // always balances (total = singletons + pairable + hot)
    def cov(cap: Int) = TextOps.winnowCoverage(many, "doc_id", "text",
      k = 8, w = 4, bucketCap = cap).head()
    val tight = cov(2); val loose = cov(50)
    Seq(tight, loose).foreach { r =>
      assert(r.getLong(1) ==
        r.getLong(2) + r.getLong(5) + r.getLong(4),
        s"occurrence ledger must balance: $r")
    }
    assert(tight.getLong(3) > 0 && tight.getDouble(6) < loose.getDouble(6))
    assert(loose.getLong(3) == 0 && loose.getDouble(6) <= 1.0)
  }

  test("minhash bucket stats ledger balances and flags hot buckets under a tight cap") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val sigs = MinHashDedup.signaturesShared(docs,
      corpusKey = TestSpark.sfDir + "/documents", "doc_id", "text", k = 16)
    def stats(cap: Int) =
      MinHashDedup.bucketStats(sigs, "doc_id", bucketCap = cap).head()
    val normal = stats(50)
    // every banded row lands in exactly one occupancy class
    assert(normal.getLong(1) ==
      normal.getLong(2) + normal.getLong(5) + normal.getLong(4))
    // total band rows = numBands per signatured doc
    assert(normal.getLong(1) == sigs.count() * MinHashDedup.numBands)
    // cap 2 reclassifies every bucket of size 3..50 as hot: pairable mass
    // can only shrink, hot mass only grow, the ledger still balances
    val tight = stats(2)
    assert(tight.getLong(1) ==
      tight.getLong(2) + tight.getLong(5) + tight.getLong(4))
    assert(tight.getLong(5) <= normal.getLong(5) &&
      tight.getLong(4) >= normal.getLong(4))
    assert(tight.getDouble(6) <= normal.getDouble(6))
  }

  test("simhash band coverage ledger balances; 32-bit bands saturate before 64-bit") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    def cov(bits: Int, cap: Int) = SimHash.bandCoverage(
      docs.select(col("doc_id"),
        (if (bits == 64) SimHash.simhash64(col("text"))
         else SimHash.simhash32(col("text"))).as("sh")),
      "doc_id", "sh", bucketCap = cap, bits = bits).head()
    val c64 = cov(64, 10000)
    assert(c64.getLong(1) == c64.getLong(2) + c64.getLong(5) + c64.getLong(4))
    assert(c64.getLong(1) == docs.count() * 4) // 4 bands per doc
    // byte bands (256 values) concentrate the same rows into far fewer
    // buckets than 16-bit bands — the saturation asymmetry the Scaladoc
    // claims; under a tight cap that shows up as strictly less coverage
    val t32 = cov(32, 5); val t64 = cov(64, 5)
    assert(t32.getLong(0) <= t64.getLong(0))
    assert(t32.getDouble(6) <= t64.getDouble(6))
  }

  test("embed block stats ledger balances; a tight cap reclassifies mass as hot") {
    val assigned = Seq(
      (1L, 0L, "en"), (2L, 0L, "en"), (3L, 0L, "en"), // block of 3
      (4L, 0L, "fr"), // singleton
      (5L, 1L, "en"), (6L, 1L, "en") // block of 2
    ).toDF("vec_id", "centroid_id", "label")
    def stats(cap: Int) =
      Similarity.blockStats(assigned, "label", blockCap = cap).head()
    val loose = stats(10)
    assert(loose.getLong(0) == 3 && loose.getLong(1) == 6)
    assert(loose.getLong(2) == 1 && loose.getLong(3) == 0)
    assert(loose.getLong(5) == 5 && loose.getDouble(6) == 5.0 / 6.0)
    val tight = stats(2)
    // the 3-block goes hot; ledger still balances
    assert(tight.getLong(3) == 1 && tight.getLong(4) == 3)
    assert(tight.getLong(1) ==
      tight.getLong(2) + tight.getLong(5) + tight.getLong(4))
    assert(tight.getDouble(6) < loose.getDouble(6))
  }

  test("ivf list balance accounts for every vector and bounds skew sanely") {
    val r = Queries.ivfListBalance(spark, TestSpark.sfDir).head()
    val nVecs = Tables.embeddings(spark, TestSpark.sfDir).count()
    assert(r.getLong(1) == nVecs) // every vector lands in exactly one list
    assert(r.getLong(0) <= 16L) // at most the fixed centroid count
    assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(3))
    // avg between min and max; skew = max/avg >= 1 by construction
    assert(r.getDouble(4) >= r.getLong(2).toDouble &&
      r.getDouble(4) <= r.getLong(3).toDouble)
    assert(r.getDouble(5) >= 1.0)
  }

  test("ivf-pq: recall vs exact brute force stays high; pool is genuinely PQ-pruned") {
    val dir = "/root/testdata/sf0.001"
    val exact = Queries.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Queries.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.nonEmpty)
    // per-query result size never exceeds k
    assert(pq.groupBy(_._1).values.forall(_.length <= Queries.AnnTopK))
    // recall@10 against brute force: the PQ+probe stack must stay a
    // usable approximation (IVF probe loss + PQ pool loss combined)
    val recall = pq.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.5, s"ivf-pq recall $recall too low")
    // deterministic end-to-end: a second run (decimal ADC sums, id
    // tie-breaks at every window) reproduces the exact row set
    val again = Queries.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSet == pq.toSet)
  }

  test("bpe training: deterministic merge order, overlap counting, greedy application, tie-breaks") {
    // round 1: (a,b) count 2+3=5 beats (a,a) count 4 (two adjacent
    // occurrences in "aaab", weight 2) — overlapping positions both count
    val m1 = Bpe.train(Seq("aaab" -> 2L, "ab" -> 3L), numMerges = 1)
    assert(m1.merges == Seq((0, "a", "b", "ab", 5L)))
    // greedy left-to-right: "aaa" under merge (a,a) becomes [aa, a]
    val m2 = Bpe.train(Seq("aaa" -> 1L), numMerges = 1)
    assert(m2.merges == Seq((0, "a", "a", "aa", 2L)))
    assert(m2.wordSegments("aaa") == 2)
    // count tie broken by (a asc, b asc): (x,y) before (x,z)
    val m3 = Bpe.train(Seq("xy" -> 1L, "xz" -> 1L), numMerges = 1)
    assert(m3.merges == Seq((0, "x", "y", "xy", 1L)))
    // merges compose: after (a,b)->(ab), round 2 of "abab" merges
    // (ab, ab); segments collapse to 1
    val m4 = Bpe.train(Seq("abab" -> 1L), numMerges = 2)
    assert(m4.merges.map(t => (t._2, t._3, t._4)) ==
      Seq(("a", "b", "ab"), ("ab", "ab", "abab")))
    assert(m4.wordSegments("abab") == 1)
    // a corpus that cannot support the requested depth refuses loudly
    intercept[IllegalArgumentException] {
      Bpe.train(Seq("ab" -> 1L), numMerges = 2)
    }
  }

  test("bpe token counts ride the trained segmentation via broadcast join") {
    val docs = Seq((1L, "abab ab"), (2L, "abab abab abab")).toDF("doc_id", "text")
    val words = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val model = Bpe.train(words, numMerges = 2)
    // after (a,b) and (ab,ab): "abab" = 1 token, "ab" = 1 token
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts == Map(1L -> ((2L, 2L)), 2L -> ((3L, 3L))))
  }

  test("bpe training collect is cap-bounded and cap-equivalent above the vocabulary") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val uncapped = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // a cap above the true vocabulary collects the IDENTICAL table (as a
    // set — TakeOrdered fixes an order; training stats are order-free)
    val capped = Bpe.collectTrainingWords(docs, "text",
      maxWords = uncapped.size + 1000)
    assert(capped.toSet == uncapped.toSet)
    assert(Bpe.train(capped, 10).merges == Bpe.train(uncapped, 10).merges)
    // a cap BELOW the vocabulary keeps the highest-count words and is
    // bounded at exactly the cap — the 100 TB driver-memory contract
    val tiny = Bpe.collectTrainingWords(docs, "text", maxWords = 5)
    assert(tiny.size == 5)
    assert(tiny.map(_._2).min >= uncapped.sortBy(-_._2).drop(5).map(_._2).max)
  }

  test("bpe token counts: out-of-vocab words segment via the distributed merge replay") {
    // train on a corpus WITHOUT "aabab", then tokenize a doc containing it:
    // the left-join misses, and the expression replay must produce the
    // same greedy segmentation the driver-side trainer would —
    // (a,b)->ab then (ab,ab)->abab gives "aabab" -> [a, ab, ab] ->
    // wait: greedy rule 1 on a-a-b-a-b -> [a, ab, ab]; rule 2 needs
    // adjacent (ab,ab) -> [a, abab] = 2 segments
    val trainDocs = Seq((1L, "abab ab abab")).toDF("doc_id", "text")
    val words = Bpe.wordCounts(trainDocs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val model = Bpe.train(words, numMerges = 2)
    assert(!model.wordSegments.contains("aabab"))
    val applied = Seq((9L, "aabab ab")).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(applied, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "aabab" = 2 segments (replayed), "ab" = 1 (trained map)
    assert(counts == Map(9L -> ((2L, 3L))))
    // the replay expression alone agrees with a driver-side application
    val seg = applied.select(
      Bpe.segmentCountExpr(org.apache.spark.sql.functions.lit("aabab"), model))
      .head().getInt(0)
    assert(seg == 2)
  }

  test("image dhash: a resized re-encoded PNG pairs with its original; a distinct image does not") {
    // blocky column pattern aligned to the 9-wide dHash grid (72 px / 9
    // cells = 8 px per cell): cell-constant luma makes the hash exactly
    // resize-stable, so the pair assertion tests the pipeline, not
    // resampling luck
    def png(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(72, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 72) {
        val v = f(x * 9 / 72) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val orig = png(cx => (cx * 53) % 256)
    val distinct = png(cx => 255 - (cx * 53) % 256)
    // REAL bilinear resize + PNG re-encode (different bytes, same content)
    val resized = Multimodal.imageResize(orig, 36, 32).get
    assert(!java.util.Arrays.equals(orig, resized))
    val (hOrig, dOrig) = ImageHashImpl.dhash(orig)
    val (hRes, dRes) = ImageHashImpl.dhash(resized)
    val (hDist, _) = ImageHashImpl.dhash(distinct)
    assert(dOrig == "imageio" && dRes == "imageio")
    assert(java.lang.Long.bitCount(hOrig ^ hRes) <= 3)
    assert(java.lang.Long.bitCount(hOrig ^ hDist) > 3)
    // end to end through the media frame + the SimHash banding: only the
    // (original, resized) pair survives
    val media = Seq((1L, orig), (2L, resized), (3L, distinct))
      .toDF("doc_id", "media")
    val pairs = ImageHash.dhashPairs(media, maxHamming = 3, bucketCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // a non-image payload takes the deterministic fallback and matches
    // the byte-sampling definition the oracle replays
    val textBytes = "some plain utf8 text payload that is not an image at all"
      .getBytes("UTF-8")
    val (hTxt, dTxt) = ImageHashImpl.dhash(textBytes)
    assert(dTxt == "opaque")
    assert(hTxt == ImageHashImpl.dhashFromGrays(
      ImageHashImpl.fallbackGrays(textBytes)))
  }

  test("substring dedup: maximal cross-doc spans at arbitrary boundaries; within-doc repeats excluded; hashed variant identical") {
    // a 10-token run shared at DIFFERENT offsets (position 4 in doc 1,
    // position 1 in doc 2) — exactly what chunk-aligned dedup misses
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared x y z"),
      (2L, s"$shared p q r s t u v w"),
      (3L, "totally unrelated words with nothing in common at all right here ok"),
      // an 8-gram repeated WITHIN one doc only: not a cross-document
      // duplicate, must not be marked
      (4L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.substringSpans(docs, "doc_id", "text",
        minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // anchors 4..6 in doc 1 cover tokens [4, 13]; anchors 1..3 in doc 2
    // cover [1, 10] — ONE maximal merged span each, full 10-token length
    assert(spans == Set((1L, 4L, 13L, 10L), (2L, 1L, 10L, 10L)))
    val hashed = SubstringDedup.substringSpansHashed(docs, "doc_id", "text",
        minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(hashed == spans)
    // stats rollup zero-fills non-duplicated docs and covers every doc
    val stats = SubstringDedup.substringDupStats(docs, "doc_id", "text",
        minSpanTokens = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(stats.keySet == Set(1L, 2L, 3L, 4L))
    assert(stats(1L) == ((10L, 1L)) && stats(2L) == ((10L, 1L)))
    assert(stats(3L) == ((0L, 0L)) && stats(4L) == ((0L, 0L)))
  }

  test("cluster split: every near-dup cluster lands in one split wholesale") {
    val rows = Queries.clusterSplit(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 500)
    // the no-straddle invariant the per-doc split cannot give
    rows.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // multi-member clusters exist at this sf, so the invariant bites
    assert(rows.groupBy(_._2).values.exists(_.length > 1))
    assert(rows.map(_._3).distinct.toSet.subsetOf(Set("train", "holdout")))
    CacheBin.drain()
  }

  test("hard negatives: dense hits minus the sparse lists, ranks contiguous in dense order") {
    val negs = Queries.hardNegatives(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
    assert(negs.nonEmpty)
    val sparse = Queries.bm25TopK(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negs.forall { case (q, d, _, _) => !sparse.contains((q, d)) })
    negs.groupBy(_._1).values.foreach { rows =>
      val byNeg = rows.sortBy(_._4)
      assert(byNeg.map(_._4).toSeq == (1 to rows.length).toSeq)
      assert(byNeg.map(_._3).toSeq == byNeg.map(_._3).sorted.toSeq)
    }
    CacheBin.drain()
  }

  test("bm25 index: round-trip identical to the in-memory path; reads prune to probed buckets") {
    val docs = Seq(
      (0L, "rare common alpha pad pad2"),
      (1L, "rare zzz yyy xxx www vvv"),
      (2L, "common zzz yyy xxx www vvv"),
      (3L, "common uuu ttt sss rrr qqq"),
      (4L, "rare kkk jjj iii hhh ggg fff")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Bm25.indexWrite(docs, "doc_id", "text", dir, nBuckets = 8)
    val out = Bm25.topKFromIndex(docs, "doc_id", "text", dir, nBuckets = 8,
      nQueries = 1, queryTerms = 3, k1 = 1.2, b = 0.75, topK = 10)
    val mem = Bm25.moreLikeThis(docs, "doc_id", "text",
      nQueries = 1, queryTerms = 3, k1 = 1.2, b = 0.75, topK = 10)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(key(out) == key(mem)) // index round-trip changes nothing
    // the bucket IN-list prunes at the scan: unprobed term buckets'
    // directories are never touched
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [term_bucket"), plan.take(2000))
    CacheBin.drain()
  }

  test("training mix: per-source fills respect the temperature allocation; packing is a clean prefix-sum") {
    val mix = Queries.trainingMix(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(mix.nonEmpty)
    // every source stays within its floor(w_temp * B) allocation
    val wts = Queries.mixtureWeights(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    mix.groupBy(_._2).foreach { case (src, rows) =>
      val budget = math.floor(wts(src) * Queries.MixTokenBudget).toLong
      assert(rows.map(_._3).sum <= budget, s"$src over-filled")
    }
    assert(mix.map(_._3).sum <= Queries.MixTokenBudget)
    // offsets are the exclusive prefix-sum in doc_id order; seq from offset
    val sorted = mix.sortBy(_._1)
    var off = 0L
    sorted.foreach { case (_, _, n, start, seq) =>
      assert(start == off && seq == start / Queries.PackBudget)
      off += n
    }
    CacheBin.drain()
  }

  test("chunk windows: overlapping strides, truncated tail, short docs yield one window") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val wins = TextOps.chunkWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(wins.size == 4)
    assert(wins((1L, 1)) == ((1L, 4L, 4L, "a b c d")))
    assert(wins((1L, 2)) == ((3L, 6L, 4L, "c d e f")))
    assert(wins((1L, 3)) == ((5L, 7L, 3L, "e f g")))   // truncated tail
    assert(wins((2L, 1)) == ((1L, 2L, 2L, "x y")))     // short doc: one window
  }

  test("knn label: majority of the k nearest wins; self excluded") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1),    // the query, true label 1
      (10L, Array(1.0f, 0.1f), 1),
      (11L, Array(1.0f, -0.1f), 1),
      (12L, Array(0.9f, 0.0f), 2),   // parallel -> cosine 1.0, rank 1
      (13L, Array(0.0f, 1.0f), 2),
      (14L, Array(0.0f, 1.1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabel(vecs, "vec_id", "embedding", "label",
        isQuery = col("vec_id") < 10, k = 3).collect()
    assert(out.length == 1)
    val r = out.head
    // top-3 = {12 (l2), 10, 11 (l1)} -> label 1 wins 2:1
    assert(r.getLong(0) == 0L && r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getLong(3) == 2L && r.getBoolean(4))
  }

  test("rrf fusion: both-systems doc outranks either single-system doc; flags track membership") {
    val sparse = Seq((0L, 100L, 1), (0L, 101L, 2)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 100L, 2), (0L, 102L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = Bm25.rrfFuse(sparse, dense, k0 = 60.0, topK = 10)
      .orderBy("rank").collect()
    // 100: 1/61 + 1/62 > 102: 1/61 > 101: 1/62
    assert(fused.map(_.getLong(1)).toSeq == Seq(100L, 102L, 101L))
    val flags = fused.map(r => r.getLong(1) ->
      (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags(100L) == ((true, true)))
    assert(flags(101L) == ((true, false)))
    assert(flags(102L) == ((false, true)))
    assert(math.abs(fused.head.getDouble(4) - (1.0 / 61 + 1.0 / 62)) < 1e-15)
  }

  test("semantic decon: cosine floor vs the eval slice, hits counted per corpus vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // eval
      (1L, Array(0.0f, 1.0f)),   // eval
      (10L, Array(2.0f, 0.0f)),  // cos 1.0 with eval 0
      (11L, Array(1.0f, 1.0f)),  // cos ~0.707 with BOTH eval vectors
      (12L, Array(-1.0f, 0.1f))  // below threshold everywhere
    ).toDF("vec_id", "embedding")
    val hits = Similarity.semanticDecon(vecs, "vec_id", "embedding",
        isEval = col("vec_id") < 10, threshold = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hits.keySet == Set(10L, 11L))
    assert(hits(10L)._1 == 1L && math.abs(hits(10L)._2 - 1.0) < 1e-12)
    assert(hits(11L)._1 == 2L && math.abs(hits(11L)._2 - math.sqrt(0.5)) < 1e-12)
  }

  test("bm25: rarity beats commonality, brevity beats length, the query doc is excluded") {
    val docs = Seq(
      (0L, "rare common alpha pad pad2"),           // the query doc
      (1L, "rare zzz yyy xxx www vvv"),             // rare term, short
      (2L, "common zzz yyy xxx www vvv"),           // common term, short
      (3L, "common uuu ttt sss rrr qqq"),           // more common-term docs
      (4L, "common ppp ooo nnn mmm lll"),           //   to raise df(common)
      (5L, "rare kkk jjj iii hhh ggg fff eee ddd")  // rare term, LONG
    ).toDF("doc_id", "text")
    val hits = Bm25.moreLikeThis(docs, "doc_id", "text",
        nQueries = 1, queryTerms = 3, k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("rank").collect()
    assert(hits.forall(_.getLong(0) == 0L))
    val ranked = hits.map(_.getLong(1)).toSeq
    // df(rare)=3 < df(common)=4 ⇒ higher idf; among equal tf, the
    // shorter doc wins; common-term ties fall back to doc_id order
    assert(ranked == Seq(1L, 5L, 2L, 3L, 4L))
    assert(!ranked.contains(0L))          // no self-retrieval
    assert(hits.forall(_.getLong(2) == 1L)) // each hit matched one term
    val scores = hits.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b2) => a >= b2 })
  }

  test("substring cut: later copies lose the span, the corpus-first occurrence survives intact") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $shared x y z"),  // FIRST occurrence: untouched
      (2L, s"$shared p q r s t u v w"),      // later copy: span removed
      (3L, "totally unrelated words with nothing in common at all right here ok")
    ).toDF("doc_id", "text")
    val cut = SubstringDedup.substringCut(docs, "doc_id", "text",
        minSpanTokens = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(cut(1L)._2 == 0L && cut(1L)._3 ==
      s"one two three $shared x y z")
    assert(cut(2L)._2 == 10L && cut(2L)._3 == "p q r s t u v w")
    assert(cut(3L)._2 == 0L)
    // a FULL later duplicate empties out entirely
    val dup = Seq((1L, shared + " tail one two"), (2L, shared + " tail one two"))
      .toDF("doc_id", "text")
    val cut2 = SubstringDedup.substringCut(dup, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(cut2(1L) == ((0L, shared + " tail one two")))
    assert(cut2(2L) == ((13L, "")))
  }

  test("substring dedup: overlapping duplicated grams merge into one maximal span") {
    // doc 1 shares tokens 1-9 with doc 2 and tokens 5-13 with doc 3: the
    // covered intervals overlap, so doc 1 reports ONE span 1..13 — the
    // island merge, not per-gram fragments
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val b = "w5 w6 w7 w8 w9 w10 w11 w12 w13"
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 tail1 tail2"),
      (2L, s"$a other tokens here entirely"),
      (3L, s"prefix tokens go here $b")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.substringSpans(docs, "doc_id", "text",
        minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 1L)
    assert(spans.toSeq == Seq((1L, 1L, 13L)))
  }

  test("semdedup keep-list: member counts cover the corpus, reps are cluster minima") {
    val dir = "/root/testdata/sf0.001"
    val keep = Queries.semdedupKeep(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.rowCount(spark, dir, "embeddings")
    assert(keep.values.sum == n) // every vector is in exactly one cluster
    // a near-dup pair's two sides map to the same representative, and the
    // representative is <= both members
    val pairs = Queries.embedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cluster = MinHashDedup.connectedComponents(
        Tables.embeddings(spark, dir).select("vec_id"), "vec_id",
        Queries.embedNearDup(spark, dir)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b) && cluster(a) <= math.min(a, b))
    }
    assert(cluster.values.toSet.subsetOf(keep.keySet))
  }

  test("ivf+int8 retrieval reduces to plain IVF when the pool is unbounded") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val kc = math.max(1, math.ceil(math.sqrt(
      Tables.rowCount(spark, dir, "embeddings").toDouble)).toInt)
    val cents = emb.orderBy(col("vec_id")).limit(kc)
      .select(col("vec_id"), col("embedding"))
    val assigned = Similarity.assignedCorpusShared(emb, s"$dir/embeddings",
      "vec_id", "embedding", cents, codebookKey = s"low$kc",
      extraCols = Seq("label"))
    def composed(rf: Int) = Quantize.ivfQuantizedTopK(emb, "vec_id",
        "embedding", isQuery = col("vec_id") < 5, k = 10, nProbe = 3,
        rerankFactor = rf, centroids = cents, assigned = assigned)
      .collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        isQuery = col("vec_id") < 5, k = 10, nProbe = 3,
        centroids = Some(cents), assigned = Some(assigned))
      .collect().toSet
    // rerankFactor large enough that no candidate is pruned → the exact
    // rerank sees the full probed buckets, i.e. exactly ivfTopK
    assert(composed(1000000) == ivf)
    // at the production pool size, the quantized pruning keeps ≥ 80% of
    // the true probed top-k (int8 pool misses only near-boundary ties)
    val c4 = composed(4)
    val overlap = c4.map(r => (r.getLong(0), r.getLong(1)))
      .intersect(ivf.map(r => (r.getLong(0), r.getLong(1))))
    assert(c4.size == ivf.size && overlap.size >= (ivf.size * 8) / 10)
  }

  test("embedding outliers plan as a distributed top-k, never a global sort") {
    val plan = Queries.embedOutliers(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("multimodal: binary wrap preserves bytes; feature extraction is deterministic") {
    val docs = Seq((1L, "some payload"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMediaColumn(docs, "doc_id", "text")
    val m = media.collect().map(r => r.getLong(0) -> r).toMap
    assert(new String(m(1L).getAs[Array[Byte]]("media"), "UTF-8") == "some payload")
    assert(m(1L).getStruct(2).getAs[Long]("n_bytes") == 12L)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.getLong(0))
    assert(f1.sameElements(f2))
    assert(f1.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
  }

  test("chunk dedup: corpus-wide first occurrence wins, docs reassemble in order") {
    val docs = Seq(
      (1L, "a b c d"),  // chunks "a b","c d" — both first occurrences
      (2L, "a b x y"),  // "a b" already seen in doc 1; "x y" survives
      (3L, "c d")       // fully deduplicated away
    ).toDF("doc_id", "text")
    val out = ChunkDedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text")))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "x y")))
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("chunk dedup: a trailing short chunk is its own unit, not merged") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val out = ChunkDedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("kept_text")).toMap
    // doc 1 chunks to ["a b", "c"]; doc 2's lone chunk "c" is a duplicate
    assert(out(1L) == "a b c" && out(2L) == "")
  }

  test("mixture weights: proportional and sqrt-temperature shares sum to 1") {
    val docs = Seq(
      (1L, "web", "a b c d"), (2L, "web", "e f g h"), (3L, "code", "x y")
    ).toDF("doc_id", "source", "text")
    val w = Selection.mixtureWeights(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("w_prop"), r.getAs[Double]("w_temp")))).toMap
    assert(w("web")._1 == 2L && w("web")._2 == 8L)
    assert(w("code")._1 == 1L && w("code")._2 == 2L)
    assert(w("web")._3 == 0.8 && w("code")._3 == 0.2)
    // τ=0.5 flattens: sqrt(8)/(sqrt(8)+sqrt(2)) = 2/3, up to the 1e-6
    // floor-quantization of the denominator (the cross-engine
    // determinism guard: deviation is bounded by n_sources·1e-6/Σsqrt)
    assert(math.abs(w("web")._4 - 2.0 / 3.0) < 1e-5)
    assert(math.abs(w("web")._4 + w("code")._4 - 1.0) < 1e-5)
    assert(w("web")._4 < w("web")._3) // temperature up-samples the small source
  }

  test("dsir weights: target-like docs outrank off-target, keep fraction is exact") {
    // target slice (lang=en) uses {aa bb}; off-target uses {zz yy}; a mixed
    // doc sits between — ranking must be mixed strictly between the pure docs
    val docs = Seq(
      (1L, "en", "aa bb aa bb"), (2L, "en", "bb aa bb aa"),
      (3L, "xx", "zz yy zz yy"), (4L, "xx", "aa zz"),
      (5L, "xx", "yy zz yy zz"), (6L, "en", "aa aa bb bb"),
      (7L, "xx", "zz zz yy yy"), (8L, "xx", "yy yy zz zz")
    ).toDF("doc_id", "lang", "text")
    val out = Selection.importanceWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", keepNum = 1, keepDen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("dsir_score"), r.getAs[Boolean]("selected")))).toMap
    val pureTarget = Seq(1L, 2L, 6L).map(out(_)._1)
    val mixed = out(4L)._1
    val pureOff = Seq(3L, 5L, 7L, 8L).map(out(_)._1)
    assert(pureTarget.forall(s => s > mixed))
    assert(pureOff.forall(s => s < mixed))
    // k = ceil(8 * 1/4) = 2: exactly two selected, and they are top-scored
    val selected = out.filter(_._2._2).keySet
    assert(selected.size == 2)
    val topByScore = out.toSeq.sortBy { case (id, (s, _)) => (-s, id) }
      .take(2).map(_._1).toSet
    assert(selected == topByScore)
  }

  test("lm score: repeated bigrams outscore rare ones; <2-token docs score null") {
    // bigram counts: (a,b)=2, (a,c)=1; c1(a)=3; vocab {a,b,c,x} → V=4
    // P(b|a) = (2+1)/(3+4) = 3/7, P(c|a) = (1+1)/7 = 2/7
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    val out = Selection.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    // per-bigram terms round through DECIMAL(28,12) by design (exact,
    // order-independent summation), so compare at that precision
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2.get - 3.0 / 7.0) < 1e-12)
    assert(out(3L)._1 == 1L && math.abs(out(3L)._2.get - 2.0 / 7.0) < 1e-12)
    assert(out(4L) == ((0L, None)))
    assert(out(1L)._2.get > out(3L)._2.get)
  }

  test("gopher rules: each rule trips independently; keep is the conjunction") {
    val docs = Seq(
      (1L, ("the " * 24 + "ok").trim),              // 25 tokens, stopword-rich, repeat-heavy
      (2L, (1 to 30).map(i => s"tok$i").mkString(" ") + " the"), // diverse, has 'the'
      (3L, (1 to 30).map(i => s"tok$i").mkString(" ")),          // no stopword
      (4L, "a b")                                                // too short
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text",
      minTokens = 20L, maxTokens = 90L, minAvgTokLen = 3.0, maxAvgTokLen = 6.0,
      maxRepeatRatio = 0.5, minDistinctStop = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getAs[Boolean]("ok_repeat_ratio")) // 25 tokens, 2 distinct
    assert(out(1L).getAs[Boolean]("ok_stopwords"))
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[Boolean]("ok_token_count") &&
      !out(3L).getAs[Boolean]("ok_stopwords") && !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("ok_token_count") && !out(4L).getAs[Boolean]("keep"))
  }

  test("hashed chunk dedup equals the text-keyed formulation") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b x y c d"), (3L, "c d"), (4L, "q")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().toSeq
    assert(rows(ChunkDedup.chunkDedupHashed(docs, "doc_id", "text", 2)) ==
      rows(ChunkDedup.chunkDedup(docs, "doc_id", "text", 2)))
  }

  test("cdc dedup: content-defined boundaries catch a shift-displaced duplicate") {
    // doc 1 carries span S; doc 2 is a 3-token header + S — every fixed
    // 10-token chunk of doc 2 is misaligned against doc 1, but CDC
    // boundaries inside S depend only on S's own grams, so doc 2
    // re-chunks S identically and its interior chunks collide with doc 1's
    val span = (0 until 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, span), (2L, s"hdr1 hdr2 hdr3 $span")).toDF("doc_id", "text")
    val cdc = ChunkDedup.cdcDedup(docs, "doc_id", "text", window = 3, hexDigits = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept")))).toMap
    // doc 1 keeps everything (first occurrence); doc 2 loses the shared span
    assert(cdc(1L)._2 == cdc(1L)._1)
    assert(cdc(2L)._2 < cdc(2L)._1,
      s"CDC missed the shifted duplicate span: ${cdc(2L)}")
    // the fixed-width plane structurally cannot see it: every chunk of
    // doc 2 differs from every chunk of doc 1 at offset 3
    val fixed = ChunkDedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept")))).toMap
    assert(fixed(2L)._2 == fixed(2L)._1)
  }

  test("cdc dedup: hashed-key variant matches; short and empty docs are one chunk") {
    val docs = Seq(
      (1L, (0 until 25).map(i => s"t$i").mkString(" ")),
      (2L, "only two"), (3L, "")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect().toSeq
    val out = ChunkDedup.cdcDedup(docs, "doc_id", "text", window = 3, hexDigits = 2)
    assert(rows(ChunkDedup.cdcDedupHashed(docs, "doc_id", "text", 3, 2)) == rows(out))
    val m = rows(out).map(r => r.getLong(0) ->
      ((r.getAs[Long]("n_chunks"), r.getAs[String]("kept_text")))).toMap
    // below the gram window no boundary can fire: the whole doc is one chunk
    assert(m(2L) == ((1L, "only two")))
    assert(m(3L) == ((1L, "")))
  }

  test("audio hash: real WAVs — gain and resample survive, a different envelope doesn't") {
    // 16-bit mono WAV with a sawtooth amplitude envelope (4 ramps); the
    // envelope — not the pitch — is what the fingerprint captures
    val frames0 = 4000
    def wav(sampleRate: Int, frames: Int, gainDiv: Int, reversed: Boolean): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val phase = (i.toDouble * frames0) / frames // time-normalized position
        val ramp = phase % (frames0 / 4.0) / (frames0 / 4.0)
        val env = if (reversed) 1.0 - ramp else ramp
        val s = (28000.0 * env * math.sin(2 * math.Pi * i * 440.0 / sampleRate)).toInt / gainDiv
        pcm(i * 2) = (s & 0xFF).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (base, decBase) = AudioHashImpl.audioHash(wav(8000, 4000, 1, reversed = false))
    assert(decBase == "javasound")
    // uniform gain: neighbor-energy comparisons are scale-invariant
    val (half, _) = AudioHashImpl.audioHash(wav(8000, 4000, 2, reversed = false))
    assert(hamming(base, half) <= 3, s"gain change moved ${hamming(base, half)} bits")
    // resample: the 65-cell grid is time-normalized
    val (res, _) = AudioHashImpl.audioHash(wav(16000, 8000, 1, reversed = false))
    assert(hamming(base, res) <= 3, s"resample moved ${hamming(base, res)} bits")
    // a reversed envelope is a genuinely different clip
    val (rev, _) = AudioHashImpl.audioHash(wav(8000, 4000, 1, reversed = true))
    assert(hamming(base, rev) > 10, s"distinct envelopes collided at ${hamming(base, rev)}")
    // non-audio payloads fall back deterministically
    val bytes = "not audio at all".getBytes("UTF-8")
    val (f1, d1) = AudioHashImpl.audioHash(bytes)
    assert(d1 == "opaque" && f1 == AudioHashImpl.audioHash(bytes)._1)
  }

  test("pca: recovers a planted principal direction; components orthonormal") {
    // rank-1 data along (0.6, 0.8) with spread t ∈ {-2..2} plus a small
    // orthogonal component along (-0.8, 0.6) — PC1 must align with the
    // planted direction, PC2 with its complement, eigenvalues ordered
    val d1 = (0.6, 0.8); val d2 = (-0.8, 0.6)
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zip(
      Seq(0.1, -0.1, 0.0, -0.1, 0.1)).map { case (t, u) =>
      Array((t * d1._1 + u * d2._1).toFloat, (t * d1._2 + u * d2._2).toFloat)
    }
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim = 2, components = 2, steps = 16)
    val v1 = m.loadings(0); val v2 = m.loadings(1)
    val align1 = math.abs(v1(0) * d1._1 + v1(1) * d1._2)
    val align2 = math.abs(v2(0) * d2._1 + v2(1) * d2._2)
    assert(align1 > 0.999, s"PC1 off the planted direction: ${v1.toSeq}")
    assert(align2 > 0.999, s"PC2 off the orthogonal direction: ${v2.toSeq}")
    assert(math.abs(v1(0) * v2(0) + v1(1) * v2(1)) < 1e-3)
    // λ1 = E[t²] = 2 (mean-zero spread), λ2 = E[u²] = 0.008
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-2)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // projection recovers the planted coordinates up to sign
    val proj = df.select(col("vec_id") +: Pca.projectCols(m, "embedding"): _*)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val sgn = math.signum(proj(4L)._1) // t=+2 row fixes the sign convention
    assert(math.abs(sgn * proj(4L)._1 - 2.0) < 1e-2)
    assert(math.abs(sgn * proj(0L)._1 + 2.0) < 1e-2)
    // deterministic: a re-fit lands on bit-identical loadings
    val m2 = Pca.fit(df, "embedding", dim = 2, components = 2, steps = 16)
    assert(m.loadings.flatMap(_.toSeq).sameElements(m2.loadings.flatMap(_.toSeq)))
  }

  test("epoch order: shards partition the corpus, positions are dense, seeds permute") {
    val docs = (0L until 200L).toDF("doc_id").withColumn("text", lit("x"))
    val e0 = TextOps.epochOrder(docs, "doc_id", seed = "s0", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e0.length == 200 && e0.map(_._1).distinct.length == 200)
    assert(e0.forall(t => t._2 >= 0 && t._2 < 8))
    // dense positions 1..n within every shard
    e0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length.toLong))
    }
    // deterministic under re-run; a different seed yields a different order
    val e0b = TextOps.epochOrder(docs, "doc_id", seed = "s0", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e0.sortBy(_._1).sameElements(e0b.sortBy(_._1)))
    val e1 = TextOps.epochOrder(docs, "doc_id", seed = "s1", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e1.sortBy(_._1).map(t => (t._2, t._3)).toSeq !=
      e0.sortBy(_._1).map(t => (t._2, t._3)).toSeq)
  }

  test("split leakage partitions the verified pair set by split-pair buckets") {
    val dir = "/root/testdata/sf0.001"
    val rows = Queries.splitLeakage(spark, dir).collect()
    val labels = Set("train", "holdout")
    rows.foreach { r =>
      assert(labels(r.getString(0)) && labels(r.getString(1)))
      assert(r.getString(0) <= r.getString(1)) // unordered pair normalization
    }
    // the buckets partition the jaccard>=0.5 pair set exactly
    val total = Queries.minhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == total)
  }

  test("oov rate: top-N vocab covers in-vocab tokens; rates are consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = Queries.oovRate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      assert(r.getAs[Double]("oov_rate") == oov.toDouble / n)
    }
    // the synthetic vocabulary is ~30 words, so a top-10 vocab must leave
    // a real OOV tail in every source
    assert(rows.forall(_.getAs[Long]("n_oov") > 0))
  }

  test("curate v2: survivors satisfy every gate; PII seeding never leaks through") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.curateV2(spark, dir).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    val gopherKeep = Queries.gopherRules(spark, dir)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val lmKeep = Queries.lmScore(spark, dir)
      .filter(col("lm_score") >= Queries.CurateV2LmMin)
      .collect().map(_.getLong(0)).toSet
    val reps = Queries.dedupKeep(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(gopherKeep) && ids.subsetOf(lmKeep) && ids.subsetOf(reps))
    // the deterministic PII seed (appended to every 10th doc) must be
    // scrubbed from every surviving clean text
    assert(out.forall(r => !r.getAs[String]("clean").contains("@")))
    assert(out.forall(r => Set("train", "holdout")(r.getAs[String]("split"))))
  }

  test("minhash recall: LSH surfaces the exact near-dup probe pairs; counts reconcile") {
    val dir = "/root/testdata/sf0.001"
    val r = Queries.minhashRecall(spark, dir).collect() match {
      case Array(only) => only
      case other => fail(s"expected one summary row, got ${other.length}")
    }
    val nTrue = r.getAs[Long]("n_true"); val nCand = r.getAs[Long]("n_candidates")
    val nHits = r.getAs[Long]("n_hits")
    assert(nTrue > 0, "synthetic corpus must contain probe near-dups")
    assert(nHits <= nCand && nHits <= nTrue)
    // the candidate counts must reconcile with the shared pair table the
    // query reads (doc_a < probe-N is exactly "involves a probe")
    val probeCand = Queries.minhashPairs(spark, dir)
      .filter(col("doc_a") < Queries.dedupProbeN(spark, dir))
    assert(nCand == probeCand.count())
    assert(nHits == probeCand.filter(col("jaccard") >= 0.5).count())
    assert(r.getAs[Double]("recall") == nHits.toDouble / nTrue)
    assert(r.getAs[Double]("cand_precision") == nHits.toDouble / nCand)
    // the synthetic near-dups sit far above the 0.5 threshold, where the
    // 4-band × 2-row collision probability is ~1 — the sweep finds them all
    assert(r.getAs[Double]("recall") >= 0.9)
  }

  test("edit neardup: Levenshtein verify on the candidate sliver matches a reference DP") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.editNearDup(spark, dir).collect()
    assert(out.nonEmpty, "synthetic corpus must contain edit-near pairs")
    assert(out.forall { r =>
      val s = r.getAs[Double]("edit_sim")
      s >= Queries.EditSimThreshold && s <= 1.0
    })
    // independent check: recompute one pair's distance with a plain DP
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val cur = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = prev(j); prev(j) = cur
        }
      }
      prev(b.length)
    }
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val probe = out.head
    assert(probe.getAs[Long]("edit_dist") ==
      lev(texts(probe.getAs[Long]("doc_a")), texts(probe.getAs[Long]("doc_b"))))
  }

  test("ann recall: IVF-probed top-k recovers brute-force neighbors on testdata") {
    val dir = "/root/testdata/sf0.001"
    val rows = Queries.annRecall(spark, dir).collect()
    assert(rows.length == 5) // queries are vec_id < 5
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      val recall = r.getAs[Double]("recall")
      assert(hits >= 0L && hits <= 10L)
      assert(recall == hits.toDouble / 10.0)
    }
    // probing enough centroids must find at least half the true neighbors
    assert(rows.map(_.getAs[Double]("recall")).sum / 5 >= 0.5)
  }

  test("line dedup: a line in >= minDocs docs is dropped from EVERY doc, rare lines survive") {
    val docs = Seq(
      (1L, "keep me alpha\nsubscribe now\nkeep me beta"),
      (2L, "subscribe now\nanother unique line"),
      (3L, "subscribe now"), // all boilerplate -> empty survivor
      (4L, "no boilerplate here at all")
    ).toDF("doc_id", "text")
    val out = LineOps.lineDedup(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("keep me alpha\nkeep me beta", 3L, 1L)))
    assert(out(2L) == (("another unique line", 2L, 1L)))
    assert(out(3L) == (("", 1L, 1L))) // the doc survives, its text doesn't
    assert(out(4L) == (("no boilerplate here at all", 1L, 0L)))
  }

  test("intra-doc dedup keeps the FIRST occurrence of each line, order preserved") {
    val docs = Seq(
      (1L, "a b c\nd e f\na b c\ng h i\nd e f"),
      (2L, "only one line")
    ).toDF("doc_id", "text")
    val out = LineOps.intraDocDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c\nd e f\ng h i", 5L, 2L)))
    assert(out(2L) == (("only one line", 1L, 0L)))
  }

  test("line filter drops short, bullet, and uppercase-heavy lines; keeps prose") {
    val docs = Seq(
      (1L, "a normal prose line\nok\n- click here now\n* star bullet line\n" +
        "HOME | ABOUT | CONTACT\nanother Fine Prose line")
    ).toDF("doc_id", "text")
    val r = LineOps.lineFilter(docs, "doc_id", "text", minTokens = 3).collect().head
    assert(r.getString(1) == "a normal prose line\nanother Fine Prose line")
    assert(r.getLong(2) == 6L && r.getLong(3) == 2L)
  }

  test("misra-gries: items above n/k survive ANY partitioning; lbs never exceed truth") {
    val stream = Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 60).map(i => s"unique$i") // n=140, k=5 -> guarantee floor 28
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (p <- Seq(1, 4, 13)) {
      val sketch = stream.toDF("t").repartition(p)
        .agg(HeavyHitters.misraGries(col("t"), 5).as("s"))
        .head.getSeq[org.apache.spark.sql.Row](0)
      assert(sketch.size <= 5)
      val items = sketch.map(_.getString(0))
      // 50 > 28 and 30 > 28: both MUST be present however partials merged
      assert(items.contains("hot") && items.contains("warm"), s"p=$p: $items")
      sketch.foreach { r =>
        assert(r.getLong(1) <= truth(r.getString(0)),
          s"p=$p: lb exceeds true count for ${r.getString(0)}")
      }
    }
  }

  test("misra-gries: nulls are skipped; buffer serde round-trips") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("t").repartition(3)
    val sketch = withNulls.agg(HeavyHitters.misraGries(col("t"), 4))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(sketch.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    // direct serde round-trip (the distributed path above already
    // exercises it via partial-buffer shipping; this pins the format)
    val agg = MisraGriesSketch(org.apache.spark.sql.graftbridge.toExpression(org.apache.spark.sql.functions.lit("x")), 3)
    val buf = scala.collection.mutable.HashMap(
      org.apache.spark.unsafe.types.UTF8String.fromString("k1") -> 7L,
      org.apache.spark.unsafe.types.UTF8String.fromString("k2") -> 2L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("heavy hitters: sketch + exact confirm equals the brute-force GROUP BY") {
    val docs = Seq(
      (1L, "x x x y y z common common common common"),
      (2L, "x y common common rare1 rare2 rare3"),
      (3L, "common x x y unique tail words here")
    ).toDF("doc_id", "text")
    // n=25 tokens; phi=0.15 -> threshold ceil(3.75)=4: common(8) and x(6)
    // qualify, y(4) exactly at threshold qualifies, z/rares do not
    val out = HeavyHitters.heavyHitterTokens(docs, "text", phi = 0.15, k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().filter(col("count") >= 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1) / 25.0)).toSet
    assert(out == brute)
    assert(out.map(_._1) == Set("common", "x", "y"))
  }

  test("heavy hitters: k*phi <= 1 is rejected (guarantee would not hold)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitterTokens(docs, "text", phi = 0.01, k = 100)
    }
  }

  test("keep-best: quality overrides min-id; nulls rank last; ties break on doc_id") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster 1: scores 0.2, 0.9, null
      (4L, 4L), (5L, 4L),           // cluster 4: tie 0.5/0.5 -> min id 4
      (6L, 6L)                      // singleton, null score
    ).toDF("doc_id", "cluster_id")
    val scores = Seq(
      (1L, Some(0.2)), (2L, Some(0.9)), (3L, None),
      (4L, Some(0.5)), (5L, Some(0.5)), (6L, None)
    ).toDF("doc_id", "lm_score")
    val out = MinHashDedup.keepBest(clusters, scores, "lm_score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, Some(0.9), 3L, true)))  // promoted over min-id 1
    assert(out(4L) == ((4L, Some(0.5), 2L, false))) // tie -> smallest id
    assert(out(6L) == ((6L, None, 1L, false)))      // singleton, never promoted
    // exactly one survivor per cluster, and survivors are cluster members
    assert(out.keySet == Set(1L, 4L, 6L))
  }

  test("pmi collocations: the glued pair tops the list; the floor drops rare pairs") {
    val docs = Seq(
      (1L, "ice cream ice cream ice cream ice cream ice cream"),
      (2L, "w x w y w z w x w y")
    ).toDF("doc_id", "text")
    // N_tok=20, N_big=18; qualifying pairs at floor 4: (ice,cream) x5 and
    // (cream,ice) x4 — every doc-2 bigram occurs at most twice
    val out = TextOps.pmiCollocations(docs, "text", minPair = 4L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.length == 2)
    // expected ratios via the SAME double chain the operator uses
    val iceCream = (5.0 * 20 * 20) / (18.0 * 5 * 5)
    val creamIce = (4.0 * 20 * 20) / (18.0 * 5 * 5)
    assert(out(0) == (("ice", "cream", 5L, 5L, 5L, iceCream)))
    assert(out(1) == (("cream", "ice", 4L, 5L, 5L, creamIce)))
    // k truncates after the PMI ordering
    val top1 = TextOps.pmiCollocations(docs, "text", minPair = 4L, k = 1)
      .collect()
    assert(top1.length == 1 && top1.head.getString(0) == "ice")
  }
}
