package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, and winnowing document
  * fingerprints.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), so the operators stay inside whole-stage codegen, push down
  * through Catalyst, and scale linearly with input splits — a doc-level map
  * with no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace tokens (the baseline tokenizer; deterministic split). */
  def tokensWs(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the classic byte-pair-encoding pre-split
    * shape. Returns the token array. */
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Count of BPE-ish tokens. */
  def tokenCountBpe(text: Column): Column = size(tokensBpe(text))

  // ---- language ID -----------------------------------------------------

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed: the operator is a
    * deterministic heuristic, not a trained model. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "los")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "von", "mit")
  val StopFr: Seq[String] = Seq("le", "les", "et", "des", "une", "est", "dans")

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** Language-ID heuristic: CJK codepoints → zh; otherwise argmax of
    * stopword-marker hits with a fixed tie-break order (en, es, de, fr);
    * no hits → 'und'. Pure column expression (SQL-mirrorable). */
  def langId(text: Column): Column = {
    val toks = tokensWs(lower(text))
    val cEn = stopHits(toks, StopEn)
    val cEs = stopHits(toks, StopEs)
    val cDe = stopHits(toks, StopDe)
    val cFr = stopHits(toks, StopFr)
    when(regexp_count(text, lit("[\\u4e00-\\u9fff]")) > 0, "zh")
      .when(cEn >= cEs && cEn >= cDe && cEn >= cFr && cEn > 0, "en")
      .when(cEs >= cDe && cEs >= cFr && cEs > 0, "es")
      .when(cDe >= cFr && cDe > 0, "de")
      .when(cFr > 0, "fr")
      .otherwise("und")
  }

  // ---- quality scoring -------------------------------------------------

  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]")).cast("double") / length(text)

  def stopwordRatio(text: Column): Column = {
    val toks = tokensWs(lower(text))
    stopHits(toks, StopEn).cast("double") / size(toks)
  }

  /** Deterministic document quality score in [0,1]: rewards reasonable
    * length, light punctuation, and natural-language stopword density.
    * (Heuristic in the C4/Gopher-rules tradition, kept SQL-mirrorable.) */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokensWs(text)).cast("double")
    least(lit(1.0), nTok / 50.0) * 0.5 +
      (lit(1.0) - least(lit(1.0), punctRatio(text) * 10.0)) * 0.3 +
      least(lit(1.0), stopwordRatio(text) * 5.0) * 0.2
  }

  // ---- corpus vocabulary ----------------------------------------------

  /** All word n-grams of a BOUND token-array column, with duplicates and
    * in document order (unlike `Dedup.shinglesOfTokens`, which
    * distinct-sorts for set similarity). Fewer than n tokens → empty. */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks)
    when(cnt >= n,
      transform(sequence(lit(1), cnt - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus-level word n-gram frequencies, top `topK` by (count desc,
    * ngram asc — a total order, so the cut is deterministic). The
    * vocabulary-building pass of a tokenizer/data-mixing pipeline.
    *
    * Scale shape: explode + hash-aggregate with map-side partial counts —
    * hot n-grams pre-combine per partition before the single shuffle, so
    * a Zipf head key never concentrates raw rows on one reducer; the
    * driver-side cut is top-K only. */
  def ngramFreq(docs: org.apache.spark.sql.DataFrame, n: Int, topK: Int,
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toksed = docs.select(tokensWs(col(textCol)).as("toks"))
    val grams =
      if (n == 1) toksed.select(explode(col("toks")).as("ngram"))
      else toksed.select(explode(ngramsOfTokens(col("toks"), n)).as("ngram"))
    grams.groupBy(col("ngram")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(topK)
  }

  // ---- token-window chunking --------------------------------------------

  /** Fixed token-window chunking with stride — the training-sample prep
    * step that turns variable-length documents into model-window-sized
    * pieces (stride < size gives overlapping context windows). Chunk i
    * (0-based) covers tokens [i*stride + 1, i*stride + size]; chunks are
    * emitted while i*stride < n_tokens, so the tail chunk may be partial
    * (standard LLM packing keeps it — truncation loses data). Output:
    * (idCol, chunk_idx, chunk_text, n_chunk_tokens), one row per chunk,
    * whitespace-rejoined. NULL text emits no chunks.
    *
    * Scale shape: a pure per-row transform (sequence + slice + concat_ws,
    * all codegen'd) — NO shuffle at any corpus size; output row count is
    * ~n_tokens/stride per doc, the same fan-out an explode of the text
    * itself would cost. */
  def chunkByTokens(docs: org.apache.spark.sql.DataFrame, size: Int,
      stride: Int, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(size >= 1 && stride >= 1,
      s"size and stride must be >= 1, got size=$size stride=$stride")
    val nTok = org.apache.spark.sql.functions.size(col("__toks"))
    docs.select(col(idCol), tokensWs(col(textCol)).as("__toks"))
      .select(col(idCol), nTok.as("__n"),
        posexplode(transform(
          sequence(lit(0), floor((nTok - 1) / stride).cast("int")),
          i => concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(size))))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        least(lit(size), col("__n") - col("pos") * stride).cast("long")
          .as("n_chunk_tokens"))
  }

  // ---- unigram LM scoring (CCNet-style quality filtering, simplified) ----

  /** Per-document average unigram log-probability under the corpus's own
    * (lowercased) token distribution — the simplified form of CCNet-style
    * LM quality filtering: natural text scores near the corpus average,
    * gibberish and boilerplate-with-rare-tokens score low, a top-`
    * vocabSize` cut keeps the model bounded. p(tok) = cnt/total for the
    * top-`vocabSize` tokens (count desc, token asc — a total order, so
    * the cut is deterministic); out-of-vocabulary tokens get the floor
    * 1/total, at or below every kept token's probability (a kept token
    * with count 1 ties the floor exactly). Output: (idCol, n_tokens,
    * avg_logprob). NULL-text docs are omitted.
    *
    * Scale shape: one explode + map-side-combinable count for the vocab
    * (Zipf heads pre-combine per partition), a Catalyst top-K cut
    * (TakeOrderedAndProject — vocabSize rows, broadcast), then the corpus
    * pass is explode → BROADCAST join against the vocab → one
    * map-side-combinable groupBy(id); the corpus is never shuffled by
    * token. Fully lazy: the scalar token total is an uncorrelated scalar
    * subquery (`Dataset.scalar()`), so constructing the returned
    * DataFrame triggers no Spark jobs — unlike a driver-side `.first()`,
    * nothing runs until the caller acts, and no join node is added. */
  def lmQuality(docs: org.apache.spark.sql.DataFrame, vocabSize: Int = 50000,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val toks = docs.select(col(idCol).as("__id"),
        explode(tokensWs(lower(col(textCol)))).as("__tok"))
    val counted = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    // the scalar total counts ALL tokens (not just the kept vocab), so
    // probabilities are true corpus frequencies. It enters the plan as an
    // uncorrelated scalar subquery: evaluated once (a tiny side job) when
    // the frame first runs, embedded as a literal — no join node, nothing
    // for FoldablePropagation to degrade. An empty corpus yields an empty
    // toks frame, so the total-0 division never evaluates.
    val total = counted
      .agg(coalesce(sum(col("__cnt")), lit(0L)).cast("double").as("__total"))
      .scalar()
    val vocab = broadcast(
      counted.orderBy(col("__cnt").desc, col("__tok")).limit(vocabSize))
    toks
      .join(vocab, Seq("__tok"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(coalesce(col("__cnt"), lit(1L)).cast("double") / total))
          .as("avg_logprob"))
      .select(col("__id").as(idCol), col("n_tokens"), col("avg_logprob"))
  }

  // ---- repetition signals (Gopher-style quality rules) ------------------

  /** Repetition signals over a BOUND token-array column:
    * `struct<top_share, dup_frac>` of the doc's word n-grams (see
    * `graft.functions.NgramRepetition`). One fused codegen'd kernel, no
    * shuffle, no explode — the per-doc map shape that survives 100 TB.
    * Docs with fewer than n tokens → NULL. */
  def repetitionStats(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.NgramRepetition(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(toks), n))

  // ---- PII redaction -----------------------------------------------------

  /** Redaction rules as (pattern, replacement) pairs, applied in order.
    * Patterns are kept inside the regex subset that Java (Spark) and RE2
    * (DuckDB and most scan engines) interpret identically — no
    * backreferences, no lookaround — so the operator stays oracle-checkable
    * and portable. Order matters: specific shapes (email, ipv4) run before
    * the generic digit-run rule that would otherwise eat their pieces. */
  val PiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    // >= 7 digits, each pair separated by at most ONE of `()-`, with an
    // optional leading `+`/`(` so "(555)123-4567" consumes its opening
    // paren. Space is deliberately NOT a separator: with it, any run of
    // space-separated numbers ("1990 1991 1992", figure tables) collapses
    // into a single <PHONE>. Space-formatted phones degrade gracefully —
    // their digit groups still scrub to <NUM> via the final catch-all rule,
    // so no digits leak; only the <PHONE> label is lost.
    ("\\+?\\(?[0-9](?:[()\\-]?[0-9]){6,}", "<PHONE>"),
    ("[0-9]+", "<NUM>"))

  /** Scrubbed text: every rule's matches replaced, rules applied in order.
    * Pure `regexp_replace` chain — codegen'd, no shuffle. */
  def redact(text: Column, rules: Seq[(String, String)] = PiiRules): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, lit(pat), lit(rep))
    }

  /** How many spans the redaction chain replaced, counted per rule on the
    * PROGRESSIVELY scrubbed text (so a span consumed by an earlier rule is
    * not double-counted by a later one — same totals a re-scrub would see). */
  def redactCount(text: Column, rules: Seq[(String, String)] = PiiRules): Column = {
    val (total, _) = rules.foldLeft((lit(0), text)) {
      case ((cnt, c), (pat, rep)) =>
        (cnt + regexp_count(c, lit(pat)), regexp_replace(c, lit(pat), lit(rep)))
    }
    total
  }

  // ---- winnowing fingerprints ------------------------------------------

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * md5 every k-char gram, then keep the minimum hash of every w-gram
    * window. Near-identical documents share most fingerprints, so an
    * inverted index on the fingerprint column finds clones without pairwise
    * comparison. md5-hex strings compare lexicographically the same in every
    * engine, which keeps the operator oracle-checkable.
    *
    * Returns the DISTINCT fingerprint array per document.
    */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    val nGrams = length(text) - lit(k - 1) // # of k-char grams
    val hashes = transform(
      sequence(lit(1), greatest(nGrams, lit(1))),
      i => md5(text.substr(i, lit(k)).cast("binary")))
    val fps = transform(
      sequence(lit(1), nGrams - lit(w - 1)),
      j => array_min(slice(hashes, j, lit(w))))
    // guarded: sequence(1, x) with x < 1 would run descending
    when(length(text) >= k + w - 1, array_distinct(fps))
      .otherwise(array().cast("array<string>"))
  }

  /** The k-gram hash array alone — stage 1 of the scalable two-step form. */
  def kgramHashes(text: Column, k: Int = 8): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)).cast("binary")))

  /** Windowed minima over a BOUND hash-array column — stage 2.
    *
    * Use `df.select(kgramHashes(text).as("h")).select(winnowFromHashes(col("h")))`
    * on real data: in the single-expression `winnowFingerprints` form,
    * Catalyst inlines the hash array into the windowing lambda (it is
    * referenced once, so CollapseProject collapses), and every window
    * re-hashes the whole document — O(len²) md5 calls. This form keeps the
    * hash pass O(len) and runs the windowing as the native monotonic-deque
    * `winnow_minima` expression (O(len) amortized, no per-window slice
    * allocation). Same output as `winnowFingerprints` — OpsSpec checks the
    * two differentially. */
  def winnowFromHashes(h: Column, w: Int = 4): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.WinnowMinima(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(h), w))

  /** The production form: ONE fused codegen'd expression doing k-gram md5 +
    * deque winnowing straight off the UTF-8 bytes (no intermediate hash
    * array, no HOF lambda). Both the single-expression and the two-step
    * forms above are ejected from whole-stage codegen by `ArrayTransform`
    * (a `CodegenFallback`); this one keeps the projection `*(n)`-codegen'd.
    * Output identical to `winnowFingerprints` (Round2Spec checks it
    * differentially, including multi-byte text). */
  def winnowFingerprintsFused(text: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.WinnowFingerprint(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k, w))
}
