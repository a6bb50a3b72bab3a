package graft

import graft.functions.{Geohash, GraftFunctions, RuleCounters}

/** Geohash plugin pack (reference extensions/functions/geohash) against
  * public Niemeyer-geohash test vectors (the canonical examples:
  * u4pruydqqvj = 57.64911,10.40744 and ezs42 = 42.605,-5.603), plus
  * structural properties: decode lands inside the bounding box and
  * re-encodes to the same hash, neighbors tile the plane, int and
  * string encodings agree on their shared prefix bits.
  */
class GeoSpec extends SparkSuite {

  test("encode matches the public geohash test vectors") {
    assert(Geohash.encodeWithPrecision(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(Geohash.encodeWithPrecision(42.605, -5.603, 5) === "ezs42")
    assert(Geohash.encode(0.0, 0.0) === "s00000000000")
    assert(Geohash.encode(57.64911, 10.40744).startsWith("u4pruydqqvj"))
  }

  test("bounding box of ezs42 has the published dyadic bounds") {
    val b = Geohash.boundingBox("ezs42")
    assert(b(0) === 42.5830078125) // minLat
    assert(b(1) === 42.626953125) // maxLat
    assert(b(2) === -5.625) // minLng
    assert(b(3) === -5.5810546875) // maxLng
  }

  test("decode lands inside the box and re-encodes to the same hash") {
    for (h <- Seq("ezs42", "u4pruydqqvj", "s", "7zzzzzzzzzzz", "u4pruy")) {
      val b = Geohash.boundingBox(h)
      val p = Geohash.decode(h)
      assert(p(0) >= b(0) && p(0) <= b(1), s"$h lat ${p(0)} outside [${b(0)},${b(1)}]")
      assert(p(1) >= b(2) && p(1) <= b(3), s"$h lng ${p(1)} outside [${b(2)},${b(3)}]")
      assert(Geohash.encodeWithPrecision(p(0), p(1), h.length) === h)
    }
  }

  test("int encoding shares the string encoding's prefix bits") {
    val lat = 57.64911; val lng = 10.40744
    val full = Geohash.encodeInt(lat, lng)
    assert(Geohash.encodeWithPrecision(lat, lng, 12) ===
      {
        val h = full >>> 4 // top 60 bits = 12 base32 chars
        val out = new Array[Char](12)
        var v = h
        for (i <- 11 to 0 by -1) { out(i) = "0123456789bcdefghjkmnpqrstuvwxyz".charAt((v & 0x1f).toInt); v >>>= 5 }
        new String(out)
      })
    val p = Geohash.decodeInt(full)
    assert(math.abs(p(0) - lat) < 1e-6 && math.abs(p(1) - lng) < 1e-6)
  }

  test("neighbors tile: 8 distinct same-length cells in direction order") {
    val h = "u4pruyd"
    val ns = Geohash.neighbors(h)
    assert(ns.length === 8)
    assert(ns.distinct.length === 8)
    assert(ns.forall(_.length == h.length))
    assert(!ns.contains(h))
    assert(Geohash.neighbor(h, "North") === ns(0))
    assert(Geohash.neighbor(h, "SouthWest") === ns(5))
    // inverse moves return home
    assert(Geohash.neighbor(Geohash.neighbor(h, "North"), "South") === h)
    assert(Geohash.neighbor(Geohash.neighbor(h, "East"), "West") === h)
    // the north neighbor's box sits exactly on top of ours
    val b = Geohash.boundingBox(h)
    val nb = Geohash.boundingBox(ns(0))
    assert(math.abs(nb(0) - b(1)) < 1e-12)
    // int variant: same algebra at 64-bit precision
    val hi = Geohash.encodeInt(57.64911, 10.40744)
    assert(Geohash.neighborsInt(hi).length === 8)
    assert(Geohash.neighborInt(Geohash.neighborInt(hi, "North"), "South") === hi)
    intercept[IllegalArgumentException](Geohash.neighbor(h, "Up"))
  }

  test("boundary latitudes clamp instead of wrapping to the antipode") {
    // lat=90 must encode to the northernmost cell, not wrap to -90
    val north = Geohash.encode(90.0, 0.0)
    val b = Geohash.boundingBox(north)
    assert(b(1) === 90.0, s"maxLat of $north is ${b(1)}, expected the pole")
    assert(Geohash.decode(north)(0) > 89.9)
    // antimeridian east edge likewise stays east
    val east = Geohash.encode(0.0, 180.0)
    assert(Geohash.boundingBox(east)(3) === 180.0)
    // out-of-range inputs clamp to the nearest valid cell
    assert(Geohash.encode(95.0, 0.0) === north)
  }

  test("invalid hashes are rejected like the reference Validate") {
    intercept[IllegalArgumentException](Geohash.boundingBox(""))
    intercept[IllegalArgumentException](Geohash.boundingBox("abcdefghijklm")) // 13 chars
    intercept[IllegalArgumentException](Geohash.boundingBox("ail")) // a,i,l not in alphabet... 'a' invalid
  }

  test("SQL registry exposes the pack under the plugin's names") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT geohashEncode(57.64911D, 10.40744D) AS gh,
        |       geohashDecode('ezs42') AS dec,
        |       geohashBoundingBox('ezs42').MinLng AS minlng,
        |       geohashNeighbor('ezs42', 'North') AS nb,
        |       size(geohashNeighbors('ezs42')) AS n8,
        |       geohashDecodeInt(geohashEncodeInt(57.64911D, 10.40744D)).Latitude AS lat2,
        |       size(geohashNeighborsInt(geohashEncodeInt(0.5D, 0.5D))) AS ni8
        |""".stripMargin).head()
    assert(r.getString(0).startsWith("u4pruydqqvj"))
    val dec = r.getStruct(1)
    assert(dec.schema.fieldNames.toSeq === Seq("Longitude", "Latitude"))
    assert(dec.getDouble(1) >= 42.583 && dec.getDouble(1) <= 42.627)
    assert(r.getDouble(2) === -5.625)
    assert(r.getString(3) === Geohash.neighbor("ezs42", "North"))
    assert(r.getInt(4) === 8)
    assert(math.abs(r.getDouble(5) - 57.64911) < 1e-6)
    assert(r.getInt(6) === 8)
  }

  test("sample plugin functions: echo, countPlusOne, accumulateWordCount") {
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT echo(42) v").head().getInt(0) === 42)
    assert(spark.sql("SELECT echo('x') v").head().getString(0) === "x")
    // countPlusOne is an aggregate: len(group)+1 (countPlusOne.go:33-39)
    val c = spark.sql(
      "SELECT countPlusOne(v) FROM VALUES (1),(2),(3) AS t(v)").head().getLong(0)
    assert(c === 4L)
    // accumulateWordCount: running process counter of split sizes
    // (accumulateWordCount.go:48-74). Execution-count dependent by
    // design; a fresh counter and one single-row action gives one
    // deterministic increment per evaluation.
    RuleCounters.clear()
    val w = spark.sql(
      "SELECT accumulateWordCount('a b c', ' ') v").head().getLong(0)
    assert(w > 0 && w % 3 === 0)
    val w2 = spark.sql(
      "SELECT accumulateWordCount('d e f', ' ') v").head().getLong(0)
    assert(w2 > w && w2 % 3 === 0)
    RuleCounters.clear()
  }
}
