package graft

import org.apache.spark.sql.functions._

/** The native n-gram fingerprint kernels (graft.engine.expr.NgramFold)
  * pinned BIT-FOR-BIT against the interpreted HOF compositions they
  * replaced in docTrigramIdArrays / winnow_fingerprint /
  * exact_substring_dedup — the round-7 verdict's "no interpreted
  * expression in the codegen'd stage" item is only safe if the swap
  * provably changes zero hash values. Pins cover ASCII and multi-byte
  * UTF-8 words, widths 8 and 12, n ∈ {2, 3, 50}, the size<n empty
  * result, and null-element skipping (concat_ws/array_join contract).
  */
class NgramFoldSpec extends SparkSpec {
  import spark.implicits._

  graft.engine.expr.GraftFunctions.register(spark)

  // word arrays chosen to exercise: repeats (distinct path), multi-byte
  // UTF-8 (digest byte layout), single-char words, exactly-n and
  // size<n lengths
  private val rows = Seq(
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "a b a b a b a b",
    "über straße naïve café 東京 多字节 words mixed in here",
    "x y z",
    "one two",
    "solo",
    "",
    (1 to 60).map(i => s"w${i % 7}").mkString(" "),
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val df = rows.toDF("doc_id", "text0")
    .select(col("doc_id"), col("text0"), split(col("text0"), " ").as("w"))

  private def hofFoldIds(n: Int, width: Int): String = {
    val terms = (0 until n).map(k => s"w[i${if (k == 0) "-1" else s"+${k - 1}"}]").mkString(", ")
    s"""CASE WHEN size(w) >= $n THEN
       |  sort_array(array_distinct(transform(sequence(1, size(w) - ${n - 1}),
       |    i -> fold_hex(md5(CAST(concat_ws(' ', $terms) AS BINARY)), $width))))
       |ELSE array() END""".stripMargin
  }

  private def hofFoldSeq(n: Int, width: Int): String = {
    val terms = (0 until n).map(k => s"w[i${if (k == 0) "-1" else s"+${k - 1}"}]").mkString(", ")
    s"""CASE WHEN size(w) >= $n THEN
       |  transform(sequence(1, size(w) - ${n - 1}),
       |    i -> fold_hex(md5(CAST(concat_ws(' ', $terms) AS BINARY)), $width))
       |ELSE array() END""".stripMargin
  }

  private def hofMd5Set(n: Int): String =
    s"""CASE WHEN size(w) >= $n THEN
       |  array_distinct(transform(sequence(1, size(w) - ${n - 1}),
       |    i -> md5(CAST(array_join(slice(w, i, $n), ' ') AS BINARY))))
       |ELSE array() END""".stripMargin

  test("ngram_fold_ids == sort_array∘array_distinct∘transform(fold_hex∘md5∘concat_ws)") {
    for (n <- Seq(2, 3); width <- Seq(8, 12)) {
      val bad = df.select(col("doc_id"),
          expr(s"ngram_fold_ids(w, $n, $width)").as("native"),
          expr(hofFoldIds(n, width)).as("hof"))
        .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
        .collect()
      assert(bad.isEmpty, s"n=$n width=$width diverged: ${bad.mkString("; ")}")
    }
  }

  test("ngram_fold_seq == transform(fold_hex∘md5∘concat_ws) with order + duplicates kept") {
    for (n <- Seq(2, 3); width <- Seq(8, 12)) {
      val bad = df.select(col("doc_id"),
          expr(s"ngram_fold_seq(w, $n, $width)").as("native"),
          expr(hofFoldSeq(n, width)).as("hof"))
        .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
        .collect()
      assert(bad.isEmpty, s"n=$n width=$width diverged: ${bad.mkString("; ")}")
    }
  }

  test("ngram_md5_set == array_distinct∘transform(md5∘array_join∘slice) incl. n=50") {
    for (n <- Seq(3, 50)) {
      val bad = df.select(col("doc_id"),
          expr(s"ngram_md5_set(w, $n)").as("native"),
          expr(hofMd5Set(n)).as("hof"))
        .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
        .collect()
      assert(bad.isEmpty, s"n=$n diverged: ${bad.mkString("; ")}")
    }
  }

  test("null elements are skipped like concat_ws/array_join (no phantom separator)") {
    val wn = Seq((0L, Seq[String]("a", null, "b", "c"))).toDF("doc_id", "w")
    val got = wn.select(expr("ngram_fold_seq(w, 3, 8)").as("native"),
        expr(hofFoldSeq(3, 8)).as("hof"))
      .head()
    assert(got.getSeq[Long](0) == got.getSeq[Long](1))
    val gotS = wn.select(expr("ngram_md5_set(w, 3)").as("native"),
        expr(hofMd5Set(3)).as("hof"))
      .head()
    assert(gotS.getSeq[String](0) == gotS.getSeq[String](1))
  }

  test("chunk_fps == transform(array_join∘slice)+md5+re-split for both chunk grids") {
    // (budget=32, stride=32) is chunk_dedup's disjoint grid;
    // (budget=32, stride=24) is rag_chunk's overlapping RAG grid —
    // including each query's own chunk-COUNT formula, which the
    // kernel's covering-count must reproduce exactly
    for ((budget, stride, countSql) <- Seq(
        (32, 32, "sequence(0, (size(w) - 1) div 32)"),
        (32, 24, "sequence(0, (greatest(0, size(w) - 32) + 23) div 24)"))) {
      val hof =
        s"""transform($countSql,
           |  j -> struct(
           |    CAST(size(split(array_join(slice(w, j*$stride + 1, $budget), ' '), ' ')) AS BIGINT) AS n_tok,
           |    md5(CAST(array_join(slice(w, j*$stride + 1, $budget), ' ') AS BINARY)) AS fp))""".stripMargin
      val bad = df.filter(size(col("w")) >= 1)
        .select(col("doc_id"),
          expr(s"chunk_fps(w, $budget, $stride)").as("native"), expr(hof).as("hof"))
        .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
        .collect()
      assert(bad.isEmpty, s"budget=$budget stride=$stride diverged: ${bad.mkString("; ")}")
    }
  }

  test("char_freq == per-position substring explode + count, order modulo grouping") {
    // compare as (ch -> c) maps: the kernel emits first-occurrence
    // order, the HOF+groupBy form emits hash order
    val rowsK = df.select(col("doc_id"), explode(expr("char_freq(text0)")).as("cc"))
      .select(col("doc_id"), col("cc.ch"), col("cc.c")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap).toMap
    val rowsH = df.select(col("doc_id"), explode(expr(
        """CASE WHEN length(text0) >= 1 THEN
          |  transform(sequence(1, length(text0)), i -> substring(text0, i, 1))
          |ELSE array() END""".stripMargin)).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap).toMap
    assert(rowsK == rowsH, s"char histograms diverged:\n$rowsK\n$rowsH")
  }

  test("ngram_strings == array_distinct∘transform(concat_ws) per row") {
    for (n <- Seq(3, 8)) {
      val terms = (0 until n).map(k => s"w[i${if (k == 0) "-1" else s"+${k - 1}"}]").mkString(", ")
      val hof =
        s"""array_distinct(CASE WHEN size(w) >= $n THEN
           |  transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', $terms))
           |ELSE array() END)""".stripMargin
      val bad = df.select(col("doc_id"),
          expr(s"ngram_strings(w, $n)").as("native"), expr(hof).as("hof"))
        .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
        .collect()
      assert(bad.isEmpty, s"n=$n diverged: ${bad.mkString("; ")}")
    }
  }

  test("word_bigrams == transform(struct(w[i-1], w[i])) with order + duplicates kept") {
    val hof =
      """CASE WHEN size(w) >= 2 THEN
        |  transform(sequence(1, size(w) - 1),
        |    i -> struct(w[i-1] AS t1, w[i] AS t2))
        |ELSE array() END""".stripMargin
    val bad = df.select(col("doc_id"),
        expr("word_bigrams(w)").as("native"), expr(hof).as("hof"))
      .filter(!(col("native") <=> col("hof"))) // null-safe: a NULL kernel result must FAIL, not filter out
      .collect()
    assert(bad.isEmpty, s"diverged: ${bad.mkString("; ")}")
  }

  test("char_pair_freq == per-position substring pair explode + count, as maps") {
    val rowsK = df.select(col("doc_id"), explode(expr("char_pair_freq(text0)")).as("pr"))
      .select(col("doc_id"), col("pr.c1"), col("pr.c2"), col("pr.c")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap).toMap
    val rowsH = df.select(col("doc_id"), explode(expr(
        """CASE WHEN length(text0) >= 2 THEN
          |  transform(sequence(1, length(text0) - 1),
          |    i -> struct(substring(text0, i, 1) AS c1, substring(text0, i + 1, 1) AS c2))
          |ELSE array() END""".stripMargin)).as("pr"))
      .groupBy("doc_id", "pr.c1", "pr.c2").agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap).toMap
    assert(rowsK == rowsH, s"char-pair histograms diverged:\n$rowsK\n$rowsH")
  }

  test("minhash8 == per-seed array_min(transform(affine(fold_hex(md5))))") {
    // min over the token MULTISET equals min over the distinct set, so
    // the mirror needs no array_distinct; P and the affine constants
    // are the engine's published signature formula
    for (width <- Seq(8, 12)) {
      val mirrors = (0 until 8).map(s =>
        expr(s"""array_min(transform(w, t ->
          |  (fold_hex(md5(CAST(t AS BINARY)), $width) % 1000003
          |    * ${s * 2 + 3} + ${s * 7 + 1}) % 1000003))""".stripMargin).as(s"h$s"))
      val bad = df.select(
          (col("doc_id") +: expr(s"minhash8(w, $width)").as("native") +: mirrors): _*)
        .filter((0 until 8).map(s =>
          !(col("native").getItem(s) <=> col(s"h$s"))).reduce(_ || _))
        .collect()
      assert(bad.isEmpty, s"width=$width diverged: ${bad.mkString("; ")}")
    }
  }

  test("simhash16 == the published count·sign formula (independent JVM model)") {
    def model(text: String): Long = {
      val counts = text.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong)
      val s = new Array[Long](16)
      for ((tok, cnt) <- counts) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        for (j <- 0 until 16) {
          val sign = (Character.digit(hex(j), 16) % 2) * 2 - 1
          s(j) += cnt * sign
        }
      }
      (0 until 16).map(j => if (s(j) > 0) 1L << j else 0L).sum
    }
    val got = df.select(col("doc_id"), expr("simhash16(w)").as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, text) =>
      assert(got(id) == model(text), s"doc=$id: got ${got(id)}, model ${model(text)}")
    }
  }

  test("word_stats == explode → (doc, token) count → per-doc (sum, count, max)") {
    val got = df.select(col("doc_id"), expr("word_stats(w)").as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.n_distinct"), col("st.top_c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = df.select(col("doc_id"), explode(col("w")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("nd"), max("c").as("tc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"word_stats diverged:\n$got\n$want")
  }

  test("winnow_stats == posexplode→doc_id-window(sliding min)→distinct→groupBy") {
    // the exact composition winnow_fingerprint replaced: per-position
    // folds mod P, min over each full 4-window, (count, min, max) over
    // the distinct mins; docs with no full window (m < 4) yield null
    // in the kernel = no row in the groupBy form
    import org.apache.spark.sql.expressions.Window
    for (width <- Seq(8, 12)) {
      val hashed = df
        .select(col("doc_id"),
          posexplode(expr(s"ngram_fold_seq(w, 3, $width)")).as(Seq("pos", "__f")))
        .withColumn("h", col("__f") % 1000003L).drop("__f")
      val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
      val nW = Window.partitionBy("doc_id")
      val want = hashed
        .withColumn("ntri", count(lit(1)).over(nW))
        .withColumn("wmin", min("h").over(win))
        .filter(col("pos") <= col("ntri") - 4)
        .select(col("doc_id"), col("wmin")).distinct()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"), min("wmin").as("min_fp"), max("wmin").as("max_fp"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val got = df.select(col("doc_id"), expr(s"winnow_stats(w, 3, $width)").as("st"))
        .filter(col("st").isNotNull)
        .select(col("doc_id"), col("st.n_fp"), col("st.min_fp"), col("st.max_fp"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == want, s"width=$width diverged:\ngot  $got\nwant $want")
    }
    // null input stays null
    val nul = Seq((0L, null.asInstanceOf[Seq[String]])).toDF("doc_id", "w")
      .select(expr("winnow_stats(w, 3, 8)")).collect()
    assert(nul(0).isNullAt(0))
  }

  test("char_entropy_stats == char_freq explode + per-doc (sum c, sum c·ln c)") {
    // n_chars is exact-integer equal; the float Σ c·ln c differs only
    // in add order, so entropy compares at the query's ROUND(·,6)
    val got = df.select(col("doc_id"), expr("char_entropy_stats(text0)").as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.n_chars"),
        round(log(col("st.n_chars")) - col("st.clc") / col("st.n_chars"), 6).as("e"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = df.select(col("doc_id"), explode(expr("char_freq(text0)")).as("cc"))
      .groupBy("doc_id")
      .agg(sum("cc.c").as("n"), sum(col("cc.c") * log(col("cc.c"))).as("clc"))
      .select(col("doc_id"), col("n"),
        round(log(col("n")) - col("clc") / col("n"), 6).as("e"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want, s"char_entropy_stats diverged:\ngot  $got\nwant $want")
    // empty text yields null (the explode form emits no row); null stays null
    val edge = Seq((0L, ""), (1L, null.asInstanceOf[String])).toDF("doc_id", "t")
      .select(expr("char_entropy_stats(t)")).collect()
    assert(edge(0).isNullAt(0) && edge(1).isNullAt(0))
  }

  test("token_pairs == doc-local distinct-token self-join with t1 < t2") {
    // the exact pair surface cooccurrence_pmi replaced: every
    // unordered distinct-token pair exactly once, t1 < t2 under
    // Spark's binary string comparison (multi-byte rows exercise the
    // byte-wise ordering)
    val tok = df.select(col("doc_id"), explode(array_distinct(col("w"))).as("token"))
    val want = tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .select(col("a.doc_id"), col("a.token").as("t1"), col("b.token").as("t2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = df.select(col("doc_id"), explode(expr("token_pairs(w)")).as("p"))
      .select(col("doc_id"), col("p.t1"), col("p.t2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == want, s"token_pairs diverged:\ngot  $got\nwant $want")
    // null input stays null
    val nul = Seq((0L, null.asInstanceOf[Seq[String]])).toDF("doc_id", "w")
      .select(expr("token_pairs(w)")).collect()
    assert(nul(0).isNullAt(0))
  }

  test("size < n returns an empty array, not null, and null input stays null") {
    val out = Seq((0L, Seq("a", "b")), (1L, null.asInstanceOf[Seq[String]]))
      .toDF("doc_id", "w")
      .select(col("doc_id"), expr("ngram_fold_ids(w, 3, 8)").as("ids"),
        expr("ngram_md5_set(w, 3)").as("fps"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Long](1) == Seq.empty && out(0).getSeq[String](2) == Seq.empty)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
