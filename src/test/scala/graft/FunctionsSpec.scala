package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Envelope

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withIngestMeta: per-row uuid request_id + processing timestamp") {
    val rows = Envelope.withIngestMeta(Seq(1, 2, 3).toDF("x")).collect()
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val ids = rows.map(_.getAs[String]("request_id"))
    assert(ids.forall(id => uuidRe.findFirstIn(id).isDefined))
    assert(ids.distinct.length == 3) // unique per row, not a literal
    val ptIdx = rows(0).fieldIndex("_processing_time")
    assert(rows.forall(!_.isNullAt(ptIdx)))
  }

  test("canonicalize matches CPython json.dumps(loads(s), sort_keys=True) byte-for-byte") {
    // expected strings/hashes generated with CPython 3.x json + hashlib
    val cases = Seq(
      ("""{"b":1,"a":{"z":2,"y":[1,2]}}""",
        """{"a": {"y": [1, 2], "z": 2}, "b": 1}""",
        "1a35d31a475c8eb1f3be4fd37e8e07a0ddb77341bae226a5f2192932c8740ca7"),
      ("""{"name":"café","emoji":"😀","plain":"ok"}""",
        "{\"emoji\": \"\\ud83d\\ude00\", \"name\": \"caf\\u00e9\", \"plain\": \"ok\"}",
        "1c5e69c0f02935c6413d032a65f32cbc0af90d16ff248c6805ac870ca0580020"),
      ("""{"f1":0.0001,"f2":1e-5,"f3":1e16,"f4":1e15,"f5":1.5,"f6":-0.0,"f7":3.141592653589793,"f8":1e22,"f9":123.456e2}""",
        """{"f1": 0.0001, "f2": 1e-05, "f3": 1e+16, "f4": 1000000000000000.0, "f5": 1.5, "f6": -0.0, "f7": 3.141592653589793, "f8": 1e+22, "f9": 12345.6}""",
        "0ff7b1cab9f08338742ad025e2ed51ed58d9a6d1fa76416f2abf5799fab30e50"),
      ("""{"i1":42,"i2":-0,"i3":123456789012345678901234567890,"i4":-7}""",
        """{"i1": 42, "i2": 0, "i3": 123456789012345678901234567890, "i4": -7}""",
        "410219e0796370531b439b19a6c2ffc1c3285c79b08f814c6facf7b493988d24"),
      ("{\"s\":\"line\\nbreak\\ttab \\u0041 quote\\\" backslash\\\\ slash\\/ \\u00e9 \\ud83d\\ude00\"}",
        "{\"s\": \"line\\nbreak\\ttab A quote\\\" backslash\\\\ slash/ \\u00e9 \\ud83d\\ude00\"}",
        "849cc10778217ba7e09215c39865e4147981559db9b0519d632489897c78edd7"),
      ("{\"\\u00e9key\":1,\"zkey\":2,\"akey\":3,\"😀\":4,\"\uffff\":5}",
        "{\"akey\": 3, \"zkey\": 2, \"\\u00e9key\": 1, \"\\uffff\": 5, \"\\ud83d\\ude00\": 4}",
        "0b09ab5719e9223ec697b91b76288fe2704604b252fbc9bb78c8e875946413e6"),
      ("""{"nested":{"arr":[{"x":1.0},null,true,false,"s"],"empty_obj":{},"empty_arr":[]}}""",
        """{"nested": {"arr": [{"x": 1.0}, null, true, false, "s"], "empty_arr": [], "empty_obj": {}}}""",
        "bbd7e6b44ae1935ac1096a9770580869c9574f6d7aa0c366a46c8fb5ba6974ac"),
      ("""{"num_edge":[0.1,2.675,1.0,100.0,0.5,2e308]}""",
        """{"num_edge": [0.1, 2.675, 1.0, 100.0, 0.5, Infinity]}""",
        "3d40ff62992c3b172a0515072a43c16595cfdc3c6477a4c8505221d7e6e4444d"))
    for ((in, expCanon, expHash) <- cases) {
      assert(Envelope.canonicalize(in) == expCanon, s"canon of $in")
      assert(Envelope.canonicalHash(in) == expHash, s"hash of $in")
    }
  }

  test("pyFloatRepr matches CPython float repr on 82 fixture doubles") {
    // (ieee754 bits, CPython repr) pairs generated with random.seed(42)
    val cases = Seq(
      ("41110516633de310", "278853.5969157675"),
      ("c12cfdb4faa6e8c1", "-949978.4895546661"),
      ("c11b765573fae426", "-449941.3632617615"),
      ("c120e4d50c22b70b", "-553578.5237023545"),
      ("411cddb9b69b9f28", "472942.4283280247"),
      ("411591dbe63dfbbc", "353398.97484582267"),
      ("4127efce45546b44", "784359.1354096909"),
      ("c1293614ab6331c0", "-826122.3347411677"),
      ("c1030fe2e291b2a8", "-156156.36062945914"),
      ("c12cb2eb1f4ba062", "-940405.5611238594"),
      ("c1212c4819cd158e", "-562724.0503927933"),
      ("40c4eb49c1245740", "10710.576206724741"),
      ("c12ce5e01f0b3179", "-946928.0606322727"),
      ("c12261a965b26633", "-602324.698626703"),
      ("41124be380928cf8", "299768.8755590464"),
      ("40f5f1af6119ff40", "89882.96120643336"),
      ("c121101d8307c37c", "-559118.7559186067"),
      ("4105cb1af127dd68", "178531.36775181745"),
      ("4122e2d9d3a35a2a", "618860.9133556534"),
      ("c12e1ef4f616f452", "-987002.480643878"),
      ("4122aa6d01e075a8", "611638.5036656158"),
      ("41182fdb28ef9664", "396278.78997645364"),
      ("c113802bde2bd0a8", "-319498.9669640162"),
      ("c125072200315720", "-689041.0003764369"),
      ("412be7f449f09310", "914426.1444135625"),
      ("9510c9acabf43851", "-3.2681090977474645e-207"),
      ("cdb6cd9c7c347a6f", "-2.4014539872532526e+66"),
      ("39ac312cf5e3be39", "6.949887326949196e-31"),
      ("633046b316a76934", "6.142565465487605e+169"),
      ("51c2a60be03b6fa4", "7.245618290940147e+85"),
      ("bfeaf4f003956bba", "-0.8423996038430837"),
      ("4e6e8bb5f48fafd6", "6.588093285059898e+69"),
      ("103804a393e542fc", "1.547042905135241e-230"),
      ("b203975e2adb735c", "-9.083512326886755e-68"),
      ("1268ad4042cd3eb6", "5.4613668157738386e-220"),
      ("1700ffa66f28c13c", "7.106354420302939e-198"),
      ("e1daa521e1325194", "-2.397475499216677e+163"),
      ("4ef893050a6b2ec0", "2.7136888852880038e+72"),
      ("ccfa3dc9b16aed06", "-6.746918056878304e+62"),
      ("ba4703e5bb46f832", "-5.809859384570246e-28"),
      ("10b87a9800b49721", "4.036406269171026e-228"),
      ("25d7a3af44b350ce", "2.182620113339764e-126"),
      ("355059896820766c", "6.8279754059416e-52"),
      ("d22b129ec4dbdb8c", "-6.731950124761432e+87"),
      ("f7ebde9bd9b691d5", "-4.6010434643144406e+269"),
      ("c6861e53936ef05e", "-5.6076965205946205e+31"),
      ("0d72ba62e66b2803", "6.857038403796192e-244"),
      ("883ca0e459cccf45", "-5.419038560717912e-269"),
      ("56b9fa3a840e6ed4", "6.100916015424287e+109"),
      ("ae6ce080c4108fbb", "-4.6451824804859456e-85"),
      ("f16287e4e9c349e0", "-1.508348223681317e+238"),
      ("e059a0ee9132b63e", "-1.3744955437107498e+156"),
      ("508ebad7b7c93acf", "1.1386476824062799e+80"),
      ("a7cad415366eb16f", "-5.319456432241744e-117"),
      ("654821d07fcd9eb1", "7.823162000256247e+179"),
      ("ea1fca65e27a984d", "-1.5573852372740228e+203"),
      ("757750a9a491f0b2", "7.001536784514013e+257"),
      ("43cf2fde24933b83", "4.4945179755030134e+18"),
      ("3f22faf823bed01d", "0.00014480856941434606"),
      ("8fb5d27bbeb79919", "-5.490626608602852e-233"),
      ("434308bc89fa6a68", "1.0715260838532304e+16"),
      ("95a76d79bf3c4c06", "-2.3350784477820993e-204"),
      ("e5d7b8756dadd6c7", "-3.937150302661862e+182"),
      ("663f1c97956269f0", "3.3049199014903623e+184"),
      ("382567b85cabcc97", "3.145205125452214e-38"),
      ("ff5e9ff0ff50bde4", "-3.360225874175874e+305"),
      ("827050a82369b584", "-6.236674927065424e-297"),
      ("1745d6d87e570ddf", "1.4607987195798224e-196"),
      ("0c0fd195c17af08a", "1.388787933036284e-250"),
      ("1c11f735dc713d96", "1.8159580765449976e-173"),
      ("a0a04dc427209bdf", "-1.5564685308160895e-151"),
      ("cac5b68c28f49481", "-1.6247652544657625e+52"),
      ("6c12ace8ae340454", "3.9294110296383925e+212"),
      ("10435a1098ae4334", "2.492958483005734e-230"),
      ("61b1cd2262801c45", "4.004327038198631e+162"),
      ("3fb999999999999a", "0.1"),
      ("4005666666666666", "2.675"),
      ("3f1a36e2eb1c432d", "0.0001"),
      ("4341c37937e08000", "1e+16"),
      ("3ff0000000000001", "1.0000000000000002"),
      ("0000000000000001", "5e-324"),
      ("7fefffffffffffff", "1.7976931348623157e+308"))
    for ((hex, exp) <- cases) {
      val d = java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(hex, 16))
      assert(Envelope.pyFloatRepr(d) == exp, s"bits $hex")
    }
  }

  test("custom expressions callable from SQL after runtime registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash32('alpha beta') AS sh,
                simhash64('alpha beta') AS sh64,
                dot_decimal(array(1.5D, 2.0D), array(3.0D, 4.0D)) AS dd,
                minhash_slices('abcdefghij', 3, 8) AS mh,
                nfc_normalize('cafe\u0301') AS nfc,
                nfkc_normalize('\ufb01le') AS nfkc""").collect()(0)
    assert(r.getAs[Long]("sh") ==
      graft.llm.SimHashImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("alpha beta"), 32))
    assert((r.getAs[Long]("sh64") >>> 32) == r.getAs[Long]("sh"))
    assert(r.getAs[Double]("dd") == 12.5)
    assert(r.getAs[scala.collection.Seq[String]]("mh").length == 8)
    assert(r.getAs[String]("nfc") == "caf\u00e9")
    assert(r.getAs[String]("nfkc") == "file")
  }

  test("GraftExtensions injects the functions into a session built with it") {
    import org.apache.spark.sql.SparkSession
    val old = spark // shares the SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions()).getOrCreate()
      val got = s2.sql("SELECT simhash32('x y z') AS sh").collect()(0).getLong(0)
      assert(got == graft.llm.SimHashImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("x y z"), 32))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("bench timeQuery: failure yields err marker, never a timing") {
    val ok = Bench.timeQuery(spark, TestSpark.sfDir, (s, d) => Tables.nation(s, d))
    assert(ok.isRight && ok.toOption.get._1 >= 0.0 && ok.toOption.get._2 >= 0.0)
    val bad = Bench.timeQuery(spark, TestSpark.sfDir,
      (s, d) => s.read.parquet(d + "/no_such_table.parquet"))
    assert(bad.isLeft && bad.swap.toOption.get.nonEmpty)
  }
}
