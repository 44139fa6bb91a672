package graft

import graft.functions.Portable
import graft.operators.Skew
import graft.pipeline.Checks
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over generated inputs (scalacheck Gens with
  * a fixed seed for reproducibility — SURVEY §5 test strategy).
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  val word: Gen[String] = Gen.oneOf(
    "spark", "join", "scan", "merge", "sort", "hash", "agg", "row", "col")
  val doc: Gen[String] = Gen.chooseNum(1, 40)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("portable h32 is non-negative, bounded, and equals the SQL definition") {
    val docs = samples(doc, 60).distinct
    val df = docs.toDF("text")
      .select(col("text"), Portable.h32(col("text")).as("h"),
        expr("cast(conv(substring(md5(text), 1, 8), 16, 10) as bigint)").as("h2"))
    assert(df.filter(col("h") < 0 || col("h") >= (1L << 32)).count() === 0)
    assert(df.filter(col("h") =!= col("h2")).count() === 0)
  }

  test("shingles: count is max(tokens-2, 1) bounded and distinct") {
    val docs = samples(doc, 60).distinct
    val df = docs.toDF("text")
      .select(col("text"),
        size(split(col("text"), " ")).as("toks"),
        Portable.shingles(col("text"), 3).as("sh"))
    // distinct shingles ≤ tokens-2 for 3+ tokens, exactly 1 otherwise
    assert(df.filter(col("toks") >= 3 && size(col("sh")) > col("toks") - 2)
      .count() === 0)
    assert(df.filter(col("toks") < 3 && size(col("sh")) =!= 1).count() === 0)
    assert(df.filter(size(array_distinct(col("sh"))) =!= size(col("sh")))
      .count() === 0)
  }

  test("salted aggregation equals direct aggregation on random data") {
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-100.0, 100.0)), 200)
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", salts = 7)
    val j = direct.as("d").join(salted.as("s"), Seq("k"))
    assert(j.filter(col("d.n") =!= col("s.n")).count() === 0)
    assert(j.filter(abs(col("d.sum_v") - col("s.sum_v")) > 1e-9).count() === 0)
  }

  test("unique check flags exactly when generated data has duplicates") {
    val lists = samples(Gen.listOfN(30, Gen.chooseNum(0, 1000)), 20)
    lists.foreach { xs =>
      val hasDup = xs.distinct.size != xs.size
      val res = Checks.unique(xs.toDF("x"), "x")
      assert(res.passed === !hasDup, s"xs=$xs")
      assert(res.violations === (xs.size - xs.distinct.size))
    }
  }

  test("minhash signature agreement upper-bounds nothing below exact containment") {
    // over random docs: identical docs ⇒ est = 1.0 exactly
    val docs = samples(doc, 20).distinct
    val dup = docs ++ docs
    val df = dup.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    df.createOrReplaceTempView("prop_docs")
    // reuse the d3 signature builder shape inline: same text → same sig
    val sigs = df
      .select(col("doc_id"), col("text"), Portable.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), col("text"),
        transform(col("sh"), x => Portable.h32(x)).as("hs"))
      .select(col("doc_id"), col("text"),
        transform(sequence(lit(1), lit(16)),
          i => array_min(transform(col("hs"),
            x => ((i.cast("long") * 2L + 1L) * x + lit(104729L) * i) % Portable.MinHashP)))
          .as("sig"))
    val byText = sigs.groupBy("text").agg(countDistinct("sig").as("nsig"))
    assert(byText.filter(col("nsig") =!= 1).count() === 0)
  }

  test("native MinHashSig equals the HOF transform/array_min composition") {
    val docs = samples(doc, 60).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaHof = df
      .select(col("doc_id"),
        transform(Portable.shingles(col("text"), 3), x => Portable.h32(x)).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(1), lit(16)),
          i => array_min(transform(col("hs"),
            x => ((i.cast("long") * 2L + 1L) * x + lit(104729L) * i) % Portable.MinHashP)))
          .as("sig_hof"))
    val viaNative = df.select(col("doc_id"),
      graft.functions.ShingleHash.minHashSig(col("text"), 3, 16).as("sig"))
    val joined = viaNative.join(viaHof, "doc_id")
    assert(joined.filter(to_json(col("sig")) =!= to_json(col("sig_hof"))).count() === 0)
  }

  test("native ShingleHash60 equals the transform(shingles, h60) composition") {
    val docs = samples(doc, 60).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Seq(3, 5).foreach { n =>
      val viaHof = df.select(col("doc_id"),
        transform(Portable.shingles(col("text"), n), x => Portable.h60(x)).as("hs_hof"))
      val viaNative = df.select(col("doc_id"),
        graft.functions.ShingleHash.shingleHashes60(col("text"), n).as("hs"))
      val joined = viaNative.join(viaHof, "doc_id")
      assert(joined.filter(to_json(col("hs")) =!= to_json(col("hs_hof"))).count() === 0,
        s"n=$n mismatch")
    }
  }

  test("native SrpBandCodes equals the composed per-plane vec_dot form") {
    import graft.functions.VecOps.vec_dot
    val bands = 4
    val ppb = 6
    val dim = 16
    // deterministic pseudo-random planes and vectors (no Math.random —
    // md5-derived like production planeWeights)
    def h(key: String): Double =
      ((java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).take(4)
          .map(b => f"${b & 0xff}%02x").mkString, 16) % 2001L) - 1000L) / 1000.0
    val planes = Array.tabulate(bands * ppb, dim)((p, i) => h(s"pl:$p:$i"))
    val rows = (0 until 40).map(v => (v.toLong, (0 until dim).map(i => h(s"v:$v:$i")).toArray))
    val df = rows.toDF("vec_id", "v")
    val composed = (0 until bands).map { j =>
      (0 until ppb).map { r =>
        val wlit = array(planes(j * ppb + r).map(lit).toIndexedSeq: _*)
        when(vec_dot(col("v"), wlit) > 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val both = df.select(col("vec_id"),
      graft.functions.SrpCodes.srp_band_codes(col("v"), planes, ppb).as("native"),
      array(composed: _*).as("composed"))
    assert(both.filter(to_json(col("native")) =!= to_json(col("composed"))).count() === 0)
  }

  test("zorder interleave is a bijection: deinterleave recovers both inputs") {
    import graft.functions.ZOrder
    def deinterleave(z: Long): (Int, Int) = {
      var x = 0; var y = 0
      (0 until 16).foreach { i =>
        x |= (((z >> (2 * i)) & 1) << i).toInt
        y |= (((z >> (2 * i + 1)) & 1) << i).toInt
      }
      (x, y)
    }
    val xy = for {
      x <- Gen.chooseNum(0, 0xFFFF); y <- Gen.chooseNum(0, 0xFFFF)
    } yield (x, y)
    val cases = samples(xy, 200).distinct
    // Spark column implementation == reference == invertible
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zorder2(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(z === ZOrder.zorderRef(x, y))
      assert(deinterleave(z) === ((x, y)))
    }
    // distinct inputs → distinct codes over the sample (injectivity)
    assert(got.map(_.getLong(2)).distinct.length === cases.length)
  }

  test("Kafka wire format round-trips arbitrary batches") {
    import graft.streaming.KafkaWire
    val bytesGen: Gen[Array[Byte]] =
      Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n,
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))).map(_.toArray)
    val recGen = for {
      tsDelta <- Gen.chooseNum(0L, 1000000L)
      key <- Gen.option(bytesGen)
      value <- bytesGen
    } yield (1700000000000L + tsDelta, key.orNull, value)
    val batches = (0 until 20).map { i =>
      val recs = samples(recGen, 1 + i % 7)
      (i * 1000L, recs)
    }
    batches.foreach { case (base, recs) =>
      val decoded = KafkaWire.decodeBatch(
        KafkaWire.encodeBatch(base, recs.map(_._1).min, recs))
      assert(decoded.length === recs.length)
      decoded.zip(recs).zipWithIndex.foreach { case ((d, (ts, k, v)), i) =>
        assert(d.offset === base + i)
        assert(d.timestamp === ts)
        assert(java.util.Arrays.equals(d.key, k))
        assert(java.util.Arrays.equals(d.value, v))
      }
    }
  }

  test("bloom positions: aggregate-side and probe-side hashing agree") {
    import graft.functions.BloomAgg._
    val keys = samples(Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString), 80)
      .distinct
    val bf = keys.toDF("k").agg(bloom_build(col("k")).as("bf"))
    val missed = keys.toDF("k").crossJoin(broadcast(bf))
      .filter(!bloom_probe(col("bf"), col("k"))).count()
    // if the executor-side MessageDigest path and the expression-side
    // md5/conv path ever disagreed on one position, a member would miss
    assert(missed === 0L)
  }

  test("connected components equal union-find on random edge lists") {
    val edgeGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong); b <- Gen.chooseNum(0L, n.toLong)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es
    samples(edgeGen, 8).zipWithIndex.foreach { case (edges, i) =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => (v, find(v))).toSet
      val got = operators.ConnectedComponents
        .labels(edges.toDF("a", "b"), "a", "b", maxRounds = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"case $i: $edges")
    }
  }

  test("connected components converge logarithmically on a 300-node chain") {
    // the worst shape for plain min propagation: one path component whose
    // longest path equals |V| — O(|V|) rounds for label propagation (the
    // round-4 10× scale tier tripped exactly this on a chain-shaped
    // near-dup cluster). Large/small-star needs O(log²) rounds.
    val chain = (0L until 299L).map(v => (v, v + 1))
    val got = operators.ConnectedComponents
      .labels(chain.toDF("a", "b"), "a", "b", maxRounds = 12)
      .collect()
    assert(got.length === 300)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("Snapshots.merge equals the relational upsert on random tables") {
    import graft.sources.Snapshots
    val kv: Gen[(Long, Long)] = for {
      k <- Gen.chooseNum(1L, 40L); v <- Gen.chooseNum(-100L, 100L)
    } yield (k, v)
    val tbl: Gen[List[(Long, Long)]] = Gen.chooseNum(5, 30)
      .flatMap(n => Gen.listOfN(n, kv))
    val cases = samples(tbl, 12).map(_.groupBy(_._1).map(_._2.head).toSeq)
    cases.grouped(2).zipWithIndex.foreach { case (Seq(base, updates), i) =>
      val t = java.nio.file.Files.createTempDirectory("mprop").resolve("t").toString
      Snapshots.commit(base.toDF("k", "v").repartition(3, col("k")), t)
      Snapshots.merge(spark, t, updates.toDF("k", "v"), "k")
      val got = Snapshots.read(spark, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (base.toMap ++ updates.toMap).toSet
      assert(got === want, s"case $i")
    }
  }

  test("changeFeed equals the brute multiset diff over random DML histories") {
    import graft.sources.Snapshots
    (0 until 10).foreach { trial =>
      val rnd = new scala.util.Random(7000L + trial)
      val t = java.nio.file.Files.createTempDirectory(s"cfprop$trial")
        .resolve("t").toString
      def rows(n: Int) = Seq.fill(n)((rnd.nextLong(50), rnd.nextLong(100)))
        .groupBy(_._1).map(_._2.head).toSeq // merge needs unique keys
      Snapshots.commit(rows(20).toDF("id", "v").repartition(3, col("id")), t)
      (0 until 5).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => Snapshots.commit(rows(5).toDF("id", "v"), t)
          case 2 => Snapshots.merge(spark, t, rows(4).toDF("id", "v"), "id")
          case 3 => Snapshots.deleteWhere(spark, t, col("v") % 10 === rnd.nextInt(10))
          case 4 => Snapshots.compact(spark, t, numFiles = 2)
          case 5 => Snapshots.optimizeZOrder(spark, t, "id", "v", numFiles = 2)
        }
      }
      val vs = Snapshots.versions(spark, t)
      def multiset(v: Long): Map[(Long, Long), Int] =
        Snapshots.read(spark, t, Some(v)).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(identity).map { case (k, g) => k -> g.length }
      (0 until 3).foreach { _ =>
        val Seq(from, to) = Seq.fill(2)(vs(rnd.nextInt(vs.length))).sorted
        val feed = Snapshots.changeFeed(spark, t, from, to).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
        val si = multiset(from); val sj = multiset(to)
        def diff(a: Map[(Long, Long), Int], b: Map[(Long, Long), Int]) =
          a.map { case (k, n) => k -> (n - b.getOrElse(k, 0)) }
            .filter(_._2 > 0)
        val wantIns = diff(sj, si)
        val wantDel = diff(si, sj)
        def got(tag: String) = feed.filter(_._2 == tag).map(_._1)
          .groupBy(identity).map { case (k, g) => k -> g.length }
        assert(got("insert") === wantIns,
          s"trial $trial v$from->v$to inserts (history ${vs.mkString(",")})")
        assert(got("delete") === wantDel,
          s"trial $trial v$from->v$to deletes")
      }
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(t).getParent, true)
    }
  }

  test("scd2Runs intervals tile each user's timeline on random event streams") {
    val evGen: Gen[Seq[(Long, Long, Long, String)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        us <- Gen.chooseNum(0L, 20L) // dense → frequent same-us ties
        t <- Gen.oneOf("a", "b", "c")
      } yield (u, us, t))
    } yield rows.zipWithIndex.map { case ((u, us, t), i) => (u, i.toLong, us, t) }
    samples(evGen, 10).zipWithIndex.foreach { case (rows, ci) =>
      val got = operators.Incremental.scd2Runs(
          rows.toDF("user_id", "event_id", "us", "event_type"))
        .select("user_id", "event_type", "version", "valid_from_us",
          "valid_from_eid", "n_events", "valid_to_us")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6))))
      // brute-force reference: sort per user by (us, event_id), fold runs
      val ref = rows.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._2))
        val runs = sorted.foldLeft(Vector.empty[(String, Long, Long, Long)]) {
          case (acc, (_, eid, us, t)) =>
            if (acc.nonEmpty && acc.last._1 == t)
              acc.init :+ ((t, acc.last._2, acc.last._3, acc.last._4 + 1))
            else acc :+ ((t, us, eid, 1L))
        }
        runs.zipWithIndex.map { case ((t, from, feid, cnt), i) =>
          (u, t, (i + 1).toLong, from, feid, cnt,
            runs.lift(i + 1).map(_._2))
        }
      }.toSet
      assert(got.toSet === ref, s"case $ci: rows=$rows")
      // structural: per user, run keys strictly increase and versions are 1..k
      got.groupBy(_._1).foreach { case (_, rs) =>
        val ordered = rs.sortBy(r => (r._4, r._5))
        assert(ordered.map(_._3).toSeq === (1L to rs.length).toSeq)
      }
    }
  }

  test("CovarianceAgg equals the brute-force double loop on random int vectors") {
    val dim = 7 // small dim: the packed-triangle indexing is what's under test
    val vecGen: Gen[Seq[Array[Long]]] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-127L, 127L)).map(_.toArray)))
    samples(vecGen, 8).zipWithIndex.foreach { case (vecs, ci) =>
      val df = vecs.map(v => Tuple1(v)).toDF("qv")
        .repartition(3) // force partial buffers + a real merge path
      val got = df.agg(graft.functions.CovarianceAgg.cov_matrix(dim)(col("qv")).as("c"))
        .select(col("c.n").as("n"), col("c.sx").as("sx"), explode(col("c.pairs")).as("p"))
        .select(col("p.i"), col("p.j"), col("n"), col("p.sxy"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      assert(got.size === dim * (dim + 1) / 2, s"case $ci: triangle size")
      for (i <- 0 until dim; j <- i until dim) {
        val sxy = vecs.map(v => v(i) * v(j)).sum
        assert(got((i, j)) === ((vecs.length.toLong, sxy)),
          s"case $ci: cell ($i,$j)")
      }
    }
  }

  test("inclusion-exclusion union sizes equal direct distinct-union on random event sets") {
    // the q73 exact-audit identity: |A u B| = |A| + |B| - |A n B| over
    // per-type distinct user sets, for every type pair
    val rowGen: Gen[Seq[(String, Long)]] = Gen.chooseNum(20, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("v", "w", "x", "y"), Gen.chooseNum(0L, 30L))))
    samples(rowGen, 6).zipWithIndex.foreach { case (rows, ci) =>
      val e = rows.toDF("event_type", "user_id")
      val du = e.distinct()
      val sizes = du.groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inter = du.as("a").join(du.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        .agg(count(lit(1)).as("nb"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val types = sizes.keys.toSeq.sorted
      for (ta <- types; tb <- types if ta < tb) {
        val direct = rows.collect { case (t, u) if t == ta || t == tb => u }
          .distinct.length.toLong
        val ie = sizes(ta) + sizes(tb) - inter.getOrElse((ta, tb), 0L)
        assert(ie === direct, s"case $ci: pair ($ta,$tb)")
      }
    }
  }

  test("from_avro_safe round-trips arbitrary records and never throws on truncations") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"long"},
        |{"name":"b","type":"string"},
        |{"name":"c","type":["null","double"]}]}"""
        .stripMargin.replace("\n", "")
    import graft.functions.AvroCodec
    val recGen: Gen[(Long, String, Option[Double])] = Gen.zip(
      Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString),
      Gen.option(Gen.chooseNum(-1e6, 1e6)))
    val recs = samples(recGen, 40)
    val enc = recs.toDF("a", "b", "c")
      .select(AvroCodec.to_avro(struct(col("a"), col("b"), col("c")), schema).as("bin"))
    // clean round-trip through the SAFE decoder: data equal, no errors
    val back = enc.select(AvroCodec.from_avro_safe(col("bin"), schema).as("r"))
      .select(col("r.data.a"), col("r.data.b"), col("r.data.c"), col("r._error"))
      .collect()
    assert(back.forall(_.isNullAt(3)), "clean bytes produced an error")
    assert(back.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq === recs)
    // every strict prefix of a valid record decodes to quarantine-or-data,
    // never a task failure (truncation at any byte boundary is survivable)
    val firstBytes = enc.head().getAs[Array[Byte]](0)
    val prefixes = (0 until firstBytes.length).map(n => Tuple1(firstBytes.take(n)))
    val cut = prefixes.toDF("bin")
      .select(AvroCodec.from_avro_safe(col("bin"), schema).as("r"))
      .select(col("r._error")).collect()
    assert(cut.length === firstBytes.length) // all rows survived
  }

  test("hammingPairs60 equals brute-force all-pairs on random 60-bit signatures") {
    // clustered generator: random base signatures plus small perturbations
    // so distances straddle the threshold both ways
    val base: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
    val flip: Gen[Long] = Gen.listOfN(8, Gen.chooseNum(0, 59))
      .map(_.distinct.take(4).map(1L << _).fold(0L)(_ ^ _))
    val sigGen: Gen[Seq[Long]] = Gen.listOfN(12, base).flatMap { bs =>
      Gen.listOfN(48, Gen.zip(Gen.oneOf(bs), flip)).map(_.map { case (b, f) => b ^ f })
    }
    val sigs = samples(sigGen, 3)
    sigs.zipWithIndex.foreach { case (ss, ci) =>
      val df = ss.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("doc_id", "sig")
      val got = operators.Dedup.hammingPairs60(df, "sig", 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, i) <- ss.zipWithIndex; (b, j) <- ss.zipWithIndex
        if i < j
        h = java.lang.Long.bitCount(a ^ b) if h <= 6
      } yield (i.toLong, j.toLong, h)).toSet
      assert(got === want, s"case $ci: banding lost or invented pairs")
    }
  }

  test("LongDoubleHash equals LongMap on random workloads, survives serialization") {
    // q67's rank vector rides this hand-rolled open-addressing map
    // through a broadcast every iteration — a probe-chain bug would
    // corrupt ranks silently (no exception, just wrong lookups).
    // Reference semantics: last put wins, absent key -> default.
    import graft.functions.LongDoubleHash
    val keyGen = Gen.oneOf(
      Gen.chooseNum(0L, 50L),              // dense + guaranteed overwrites
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) // full domain
    val opsGen = Gen.chooseNum(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.zip(keyGen, Gen.chooseNum(-1e9, 1e9))))
    samples(opsGen, 40).zipWithIndex.foreach { case (ops, ci) =>
      val ref = scala.collection.mutable.LongMap.empty[Double]
      // size the map at distinct-key count exactly as q67 does (ofSize
      // of the collected row count)
      val m = LongDoubleHash.ofSize(ops.map(_._1).distinct.size)
      ops.foreach { case (k, v) => m.put(k, v); ref(k) = v }
      ref.foreach { case (k, v) =>
        assert(m.get(k, Double.NaN) === v, s"case $ci: wrong value for $k")
      }
      // keys never inserted come back as the default, not a neighbor's
      // value (linear probing must terminate at the empty sentinel)
      samples(keyGen, 20).filterNot(ref.contains).foreach { k =>
        assert(m.get(k, -7.5) === -7.5, s"case $ci: phantom hit for $k")
      }
      // the broadcast contract: a serialization round-trip preserves
      // every entry
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(m)
      val m2 = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[LongDoubleHash]
      ref.foreach { case (k, v) =>
        assert(m2.get(k, Double.NaN) === v, s"case $ci: lost $k after serde")
      }
    }
  }
}
