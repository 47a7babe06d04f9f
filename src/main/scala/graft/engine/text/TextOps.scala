package graft.engine.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Text / dedup operators over the `documents` table — the LLM-data-
  * pipeline surface (SURVEY.md §2.2 #17,18,21,22,23 + the extended
  * dedup & text-analysis family: SimHash, n-gram Jaccard, language-ID,
  * quality scoring, regex token counting, positional fingerprinting,
  * byte-level/multimodal hashing).
  *
  * Determinism: every hash is plain modular arithmetic over a global
  * token-id table (`dense_rank` over the sorted vocabulary) so the
  * DuckDB oracle reproduces it bit-for-bit — no engine-specific
  * murmur/xxhash. Jaccard/ratios are single IEEE divisions of identical
  * integers (drift-free); transcendental scores are ROUND(·,6).
  *
  * Scale notes (100 TB): the token-id table is a broadcast dimension
  * (vocab ≪ corpus); at real scale it is replaced by direct
  * `xxhash64(token)` (no global sort) — the band/bucket join shapes are
  * unchanged. Exact dedup groups by sha2(text) so the shuffle key is a
  * 32-byte digest, not the document body. MinHash/SimHash candidate
  * generation is a self-equi-join on (band, signature) / bucket —
  * shuffle-bounded, never an n² cross join.
  */
object TextOps {

  private val P = 1000003L // modulus for all arithmetic hashes

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** (doc_id, token) with multiplicity, plus lang/source. */
  private def tokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), col("source"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "token")))

  /** Global token-id table: token → dense rank in sorted vocab order. */
  private def vocab(tok: DataFrame): DataFrame =
    tok.select("token").distinct()
      .withColumn("tid", dense_rank().over(Window.orderBy("token")).cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #17 exact dedup: group by text digest, keep min doc_id
    "exact_dedup" -> ((s, d) =>
      docs(s, d)
        .groupBy(sha2(col("text").cast("binary"), 256).as("h"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"))
        .select("keeper", "copies")
        .orderBy("keeper")),

    // #18 MinHash/LSH near-dup: 8 modular min-hashes over the token
    // set, banded b=2 × r=4 (4 hashes chained per band signature).
    // r=4 keeps band collisions selective even on low-entropy token
    // sets — with r=2 the candidate self-join explodes quadratically
    // on corpora whose token sets mostly coincide.
    "minhash_near_dedup" -> ((s, d) => {
      val tok = tokens(docs(s, d)).select("doc_id", "token").distinct()
      val dt = tok.join(broadcast(vocab(tok)), "token").select("doc_id", "tid")
      // all 8 min-hashes in ONE map-side-combined aggregation (no seed
      // crossJoin, no second shuffle): mh_s = MIN((tid·(2s+3)+7s+1) % P)
      def mh(seed: Int) =
        min((col("tid") * (seed * 2 + 3) + (seed * 7 + 1)) % P).as(s"m$seed")
      val sig = dt.groupBy("doc_id").agg(mh(0), mh(1), mh(2), mh(3), mh(4), mh(5), mh(6), mh(7))
      def chain(a: Int, b: Int, c: Int, e: Int) =
        ((col(s"m$a") * 31 + col(s"m$b")) * 31 + col(s"m$c")) * 31 + col(s"m$e")
      val bands = sig.select(col("doc_id"), lit(0L).as("band"), chain(0, 1, 2, 3).as("bsig"))
        .union(sig.select(col("doc_id"), lit(1L).as("band"), chain(4, 5, 6, 7).as("bsig")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct().orderBy("d1", "d2")
    }),

    // SimHash near-dup: 16-bit signed-sum signature over token counts,
    // candidate pairs within Hamming distance 3. Candidates come from
    // a BANDED equi-join: Hamming ≤ 3 over 16 bits means at least one
    // of the 4 4-bit bands matches exactly (pigeonhole), so the join
    // is shuffle-bounded on (band, band-bits) — never an n² loop.
    "simhash_dedup" -> ((s, d) => {
      val tok = tokens(docs(s, d)).select("doc_id", "token")
      val cnt = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .join(broadcast(vocab(tok)), "token").select("doc_id", "tid", "cnt")
      val bits = cnt.sparkSession.range(16).select(col("id").as("j"))
      val sh = cnt.crossJoin(broadcast(bits))
        .select(col("doc_id"), col("j"), (col("cnt") *
          (((col("tid") * 1103515245L + 12345L + col("j") * 2654435761L)
            % 2147483647L) % 2 * 2 - 1)).as("contrib"))
        .groupBy("doc_id", "j").agg(sum("contrib").as("sgn"))
        .groupBy("doc_id")
        .agg(sum(when(col("sgn") > 0, pow(lit(2.0), col("j"))).otherwise(0.0))
          .cast("long").as("simhash"))
      val banded = sh.crossJoin(broadcast(sh.sparkSession.range(4).select(col("id").as("band"))))
        .select(col("doc_id"), col("simhash"), col("band"),
          expr("shiftright(simhash, CAST(band * 4 AS INT)) & 15").as("bb"))
      // filter on Hamming BEFORE deduping band collisions: the
      // post-filter pair set is tiny, the pre-filter one is not
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bb") === col("b.bb")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("ham"))
        .filter(col("ham") <= 3)
        .distinct()
        .orderBy("d1", "d2")
    }),

    // n-gram (word-trigram) Jaccard near-dup, threshold 0.5 — exact
    // intersection via the shared-trigram equi-join with map-side
    // partial counts (joined rows carry only two ids, never the
    // trigram sets themselves). The Jaccard is one IEEE division of
    // identical ints — drift-free. Scale path for skewed trigram df:
    // rarest-first prefix filtering (J ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉ ⇒ any
    // qualifying B hits A's first |A|−⌈t·|A|⌉+1 trigrams) — unneeded
    // at the declared scales, where trigram df tops out at ~25.
    "ngram_jaccard_dedup" -> ((s, d) => {
      val tri = docs(s, d).select(col("doc_id"), explode(expr(
        """CASE WHEN size(split(text, ' ')) >= 3 THEN
          |  transform(sequence(1, size(split(text, ' ')) - 2),
          |    i -> concat_ws(' ', split(text, ' ')[i-1], split(text, ' ')[i], split(text, ' ')[i+1]))
          |ELSE array() END""".stripMargin)).as("tri")).distinct()
      val sz = tri.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = tri.as("a").join(tri.as("b"),
          col("a.tri") === col("b.tri") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
        .withColumn("jac", round(col("inter") / (col("s1") + col("s2") - col("inter")), 6))
        .filter(col("jac") >= 0.5)
        .select("d1", "d2", "jac").orderBy("d1", "d2")
    }),

    // #21 per-language token stats
    "text_tokenize_stats" -> ((s, d) =>
      tokens(docs(s, d))
        .groupBy("lang")
        .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_tokens"),
          countDistinct("token").as("n_distinct"),
          round(count(lit(1)) / countDistinct("doc_id"), 6).as("avg_tokens_per_doc"))
        .orderBy("lang")),

    // #22 top-5 TF-IDF terms per source
    "tf_idf_top_terms" -> ((s, d) => {
      val tok = tokens(docs(s, d))
      val tf = tok.groupBy("source", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tok.groupBy("token").agg(countDistinct("doc_id").as("df"))
      val dn = docs(s, d).agg(count(lit(1)).as("dn"))
      val w = Window.partitionBy("source").orderBy(desc("score"), col("token"))
      tf.join(broadcast(dfreq), "token").crossJoin(broadcast(dn))
        .withColumn("score", round(col("tf") * log((col("dn") + 1) / (col("df") + 1)), 6))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("source", "rn", "token", "score").orderBy("source", "rn")
    }),

    // #23 lang × source distribution (declared unpivoted, §2 #23)
    "lang_source_matrix" -> ((s, d) =>
      docs(s, d).groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .orderBy("lang", "source")),

    // pivoted form of #23 — exercises RelationalGroupedDataset.pivot
    // with an explicit (deterministic) column list; engine-only check
    // (pivot output is wide, the unpivoted twin above carries the
    // oracle)
    "lang_source_pivot" -> ((s, d) =>
      docs(s, d).groupBy("lang")
        .pivot("source", (0 until 20).map(i => s"src$i"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("lang")),

    // language-ID heuristic: token → dominant lang (by corpus counts,
    // alphabetical tie-break), doc → majority token-lang vote.
    "lang_id" -> ((s, d) => {
      val tok = tokens(docs(s, d)).select("doc_id", "lang", "token")
      val byTok = tok.groupBy("token", "lang").agg(count(lit(1)).as("c"))
      val wTok = Window.partitionBy("token").orderBy(desc("c"), col("lang"))
      val tlang = byTok.withColumn("rn", row_number().over(wTok)).filter(col("rn") === 1)
        .select(col("token"), col("lang").as("tlang"))
      val votes = tok.join(broadcast(tlang), "token")
        .groupBy("doc_id", "lang", "tlang").agg(count(lit(1)).as("v"))
      val wDoc = Window.partitionBy("doc_id").orderBy(desc("v"), col("tlang"))
      votes.withColumn("rn", row_number().over(wDoc)).filter(col("rn") === 1)
        .select(col("doc_id"), col("tlang").as("pred"), col("lang"),
          when(col("tlang") === col("lang"), 1).otherwise(0).as("hit"))
        .orderBy("doc_id")
    }),

    // quality scoring: token counts, distinct ratio, avg token length
    "quality_score" -> ((s, d) => {
      val arr = split(col("text"), " ")
      docs(s, d).select(
        col("doc_id"),
        size(arr).as("n_tok"),
        round(size(array_distinct(arr)) / size(arr).cast("double"), 6).as("distinct_ratio"),
        round((length(col("text")) - (size(arr) - 1)) / size(arr).cast("double"), 6).as("avg_tok_len"),
        round((size(array_distinct(arr)) / size(arr).cast("double"))
          * least(lit(1.0), size(arr) / lit(50.0)), 6).as("score"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace split vs BPE-ish regex
    "token_count_regex" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|\\S"), lit(0))).as("n_bpe"))
        .orderBy("doc_id")),

    // positional rolling-hash document fingerprint:
    // fp = Σ (tid_pos · ((pos·131+7) mod P)) mod P, all mod P
    "doc_fingerprint" -> ((s, d) => {
      val tok = tokens(docs(s, d)).select(col("doc_id"), (col("pos") + 1).as("p"), col("token"))
      tok.join(broadcast(vocab(tok)), "token")
        .select(col("doc_id"), (col("tid") * ((col("p") * 131 + 7) % P) % P).as("term"))
        .groupBy("doc_id").agg((sum("term") % P).as("fp"))
        .orderBy("doc_id")
    }),

    // multimodal/byte surface: opaque bytes + typed digests (zh docs
    // make octet_length ≠ char length)
    "q_multimodal_bytes" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        octet_length(col("text")).as("nbytes"),
        length(col("text")).as("nchars"),
        md5(col("text").cast("binary")).as("md5h"),
        sha2(col("text").cast("binary"), 256).as("sha256h"))
        .orderBy("doc_id")),
  )

  private val TOK =
    """tok AS (SELECT doc_id, lang, source, u.i AS pos, string_split(text, ' ')[u.i] AS token
      |  FROM documents, UNNEST(generate_series(1, len(string_split(text, ' ')))) AS u(i)),
      |vocab AS (SELECT token, CAST(DENSE_RANK() OVER (ORDER BY token) AS BIGINT) AS tid
      |  FROM (SELECT DISTINCT token FROM tok))""".stripMargin

  val oracles: Map[String, String] = Map(
    "exact_dedup" ->
      """SELECT MIN(doc_id) AS keeper, COUNT(*) AS copies
        |FROM documents GROUP BY text ORDER BY keeper""".stripMargin,

    "minhash_near_dedup" ->
      s"""WITH $TOK,
         |dt AS (SELECT DISTINCT doc_id, tid FROM tok JOIN vocab USING (token)),
         |h AS (SELECT doc_id, u.seed AS seed,
         |  (tid * (u.seed * 2 + 3) + (u.seed * 7 + 1)) % 1000003 AS h
         |  FROM dt, UNNEST(generate_series(0, 7)) AS u(seed)),
         |sig AS (SELECT doc_id, seed, MIN(h) AS mh FROM h GROUP BY 1, 2),
         |bands AS (SELECT doc_id, seed // 4 AS band,
         |  ((MIN(CASE WHEN seed % 4 = 0 THEN mh END) * 31
         |    + MIN(CASE WHEN seed % 4 = 1 THEN mh END)) * 31
         |    + MIN(CASE WHEN seed % 4 = 2 THEN mh END)) * 31
         |    + MIN(CASE WHEN seed % 4 = 3 THEN mh END) AS bsig
         |  FROM sig GROUP BY doc_id, seed // 4)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
         |  AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin,

    "simhash_dedup" ->
      s"""WITH $TOK,
         |cnt AS (SELECT doc_id, tid, COUNT(*) AS cnt
         |  FROM tok JOIN vocab USING (token) GROUP BY 1, 2),
         |sg AS (SELECT doc_id, u.j AS j,
         |  SUM(cnt * (((tid * 1103515245 + 12345 + u.j * 2654435761) % 2147483647) % 2 * 2 - 1)) AS sgn
         |  FROM cnt, UNNEST(generate_series(0, 15)) AS u(j) GROUP BY 1, 2),
         |sh AS (SELECT doc_id,
         |  CAST(SUM(CASE WHEN sgn > 0 THEN POWER(2, j) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM sg GROUP BY 1)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  bit_count(xor(a.simhash, b.simhash)) AS ham
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,

    "ngram_jaccard_dedup" ->
      """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |tri AS (SELECT DISTINCT doc_id, UNNEST(list_transform(
        |    generate_series(1, len(a) - 2),
        |    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS tri
        |  FROM arr),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tri GROUP BY 1),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |  FROM tri a JOIN tri b ON a.tri = b.tri AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  ROUND(inter / (s1.sz + s2.sz - inter), 6) AS jac
        |FROM inter JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
        |WHERE ROUND(inter / (s1.sz + s2.sz - inter), 6) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    "text_tokenize_stats" ->
      s"""WITH $TOK
         |SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
         |  COUNT(DISTINCT token) AS n_distinct,
         |  ROUND(COUNT(*) / COUNT(DISTINCT doc_id), 6) AS avg_tokens_per_doc
         |FROM tok GROUP BY lang ORDER BY lang""".stripMargin,

    "tf_idf_top_terms" ->
      s"""WITH $TOK,
         |tf AS (SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |dn AS (SELECT COUNT(*) AS dn FROM documents),
         |scored AS (SELECT source, token,
         |  ROUND(tf * ln(CAST(dn + 1 AS DOUBLE) / (df + 1)), 6) AS score
         |  FROM tf JOIN dfreq USING (token) CROSS JOIN dn),
         |ranked AS (SELECT source, token, score,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, token) AS rn
         |  FROM scored)
         |SELECT source, rn, token, score FROM ranked WHERE rn <= 5
         |ORDER BY source, rn""".stripMargin,

    "lang_source_matrix" ->
      """SELECT lang, source, COUNT(*) AS n FROM documents
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "lang_id" ->
      s"""WITH $TOK,
         |bytok AS (SELECT token, lang, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |tlang AS (SELECT token, lang AS tlang FROM (SELECT token, lang,
         |  ROW_NUMBER() OVER (PARTITION BY token ORDER BY c DESC, lang) AS rn
         |  FROM bytok) WHERE rn = 1),
         |votes AS (SELECT doc_id, tok.lang AS lang, tlang, COUNT(*) AS v
         |  FROM tok JOIN tlang USING (token) GROUP BY 1, 2, 3),
         |pick AS (SELECT doc_id, lang, tlang, ROW_NUMBER() OVER
         |  (PARTITION BY doc_id ORDER BY v DESC, tlang) AS rn FROM votes)
         |SELECT doc_id, tlang AS pred, lang,
         |  CASE WHEN tlang = lang THEN 1 ELSE 0 END AS hit
         |FROM pick WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "quality_score" ->
      """WITH q AS (SELECT doc_id, length(text) AS nc,
        |  len(string_split(text, ' ')) AS n_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_dis
        |  FROM documents)
        |SELECT doc_id, n_tok,
        |  ROUND(n_dis / CAST(n_tok AS DOUBLE), 6) AS distinct_ratio,
        |  ROUND((nc - (n_tok - 1)) / CAST(n_tok AS DOUBLE), 6) AS avg_tok_len,
        |  ROUND((n_dis / CAST(n_tok AS DOUBLE))
        |    * LEAST(1.0, n_tok / 50.0), 6) AS score
        |FROM q ORDER BY doc_id""".stripMargin,

    "token_count_regex" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" ->
      s"""WITH $TOK,
         |t AS (SELECT doc_id, (tid * ((pos * 131 + 7) % 1000003) % 1000003) AS term
         |  FROM tok JOIN vocab USING (token))
         |SELECT doc_id, CAST(SUM(term) % 1000003 AS BIGINT) AS fp
         |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_multimodal_bytes" ->
      """SELECT doc_id, octet_length(encode(text)) AS nbytes, length(text) AS nchars,
        |  md5(text) AS md5h, sha256(text) AS sha256h
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
