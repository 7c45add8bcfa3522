package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines: PII
  * redaction, rule-based quality filtering (the published Gopher/C4-style
  * heuristics), and benchmark decontamination by n-gram overlap. Pure
  * column expressions and equi-joins — no UDFs, no driver-side loops, so
  * every operator keeps its shape at corpus scale.
  */
object Curation {

  // ---- PII redaction -------------------------------------------------

  /** Conservative, well-known patterns; a production pipeline would add
    * locale-specific ones behind the same column contract.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** Replace emails/phones with redaction tokens (order: emails first so a
    * phone-looking fragment inside an address cannot resurface).
    */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  // ---- Rule-based quality (Gopher rules 1-4, Rae et al. 2021 §A1.1) ---

  /** Word-count bounds. */
  def ruleWordCount(text: Column, min: Int = 5, max: Int = 100000): Column = {
    val n = TextAnalysis.tokenCount(text)
    n >= min && n <= max
  }

  /** Mean word length within [minLen, maxLen] characters. */
  def ruleMeanWordLen(text: Column, minLen: Double = 2.0, maxLen: Double = 10.0): Column = {
    val m = TextAnalysis.avgWordLen(text)
    m >= minLen && m <= maxLen
  }

  /** At most `maxRatio` of tokens are symbolic (no alphanumeric character —
    * the hash/ellipsis symbol-to-word screen).
    */
  def ruleSymbolRatio(text: Column, maxRatio: Double = 0.1): Column = {
    val ws = TextAnalysis.tokens(text)
    val symbolic = aggregate(ws, lit(0L),
      (acc, w) => acc + when(w.rlike("[A-Za-z0-9]"), 0L).otherwise(1L))
    symbolic.cast("double") <=
      greatest(size(ws), lit(1)).cast("double") * maxRatio
  }

  /** At least `minHits` distinct-position stopword occurrences (the Gopher
    * "contains at least two stop words" screen).
    */
  def ruleStopwords(text: Column, minHits: Int = 2): Column = {
    val ws = TextAnalysis.tokens(text)
    aggregate(ws, lit(0L),
      (acc, w) => acc + when(w.isin(TextAnalysis.StopwordsEn: _*), 1L).otherwise(0L)) >=
      minHits
  }

  /** Conjunction of the four rules — the keep flag. */
  def gopherKeep(text: Column): Column =
    ruleWordCount(text) && ruleMeanWordLen(text) &&
      ruleSymbolRatio(text) && ruleStopwords(text)

  // ---- Benchmark decontamination -------------------------------------

  /** All `n`-token shingles of `text` as space-joined strings (empty array
    * when the document is shorter than `n`).
    */
  def ngrams(text: Column, n: Int): Column = {
    val ws = TextAnalysis.tokens(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Training documents sharing at least one `n`-gram with the benchmark
    * set — the published test-set-contamination screen (e.g. GPT-3 App. C /
    * Gopher §A1.2 use 8-13-gram overlap).
    *
    * Scale shape: the benchmark side is the eval suites — dimension-sized
    * by definition — so its distinct gram set BROADCASTS and the train
    * corpus (the 100 TB side) is filtered in a single map-side pass: no
    * shuffle of train grams at all. The train side is deliberately NOT
    * pre-deduplicated — the final per-doc `countDistinct` dedups the few
    * surviving hits, whereas a train-side distinct would hash-shuffle
    * every gram of the whole corpus just to avoid re-testing duplicates
    * against a broadcast set (measured 2x on q_decontaminate). The only
    * shuffle left is the per-doc aggregation of matched grams,
    * O(contaminated hits).
    *
    * Returns (docId, n_hits): distinct benchmark grams matched per
    * contaminated training doc.
    */
  def contaminated(train: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 8): DataFrame = {
    // n_hits counts DISTINCT matched grams per doc, so both sides can
    // explode the codegen'd distinct-shingle set (WordShingles, one pass
    // per row) instead of the interpreted all-occurrences HOF chain —
    // identical result, strictly fewer exploded rows.
    val shingles = (t: Column) =>
      graft.functions.TextHashExpressions.wordShingles(t, n)
    train.select(col(idCol), explode(shingles(col(textCol))).as("gram"))
      .join(broadcast(
        bench.select(explode(shingles(col(textCol))).as("gram")).distinct()),
        Seq("gram"))
      .groupBy(idCol)
      .agg(countDistinct(col("gram")).as("n_hits"))
  }

  // ---- within-document repetition screens (Gopher §A1.1 rules 5-8) ---

  /** Per-document repetition statistics over word `n`-grams:
    * `dupfrac` = 1 − distinct/total grams, `topfrac` = most-frequent-gram
    * occupancy. Documents shorter than `n` words are dropped (no grams).
    *
    * Two physical forms, identical values: SHORT documents
    * (< `longDocTokens` words) use pure array expressions — per-row
    * compute, no shuffle — but the top-gram count there is O(grams²) per
    * row, which is fine at tens of words and quadratic death on 10k-token
    * web documents. LONG documents switch to explode → count per
    * (doc, gram) → per-doc aggregate: two keyed, skew-safe shuffles whose
    * cost is O(total grams). Both branches divide exact integer counts, so
    * the union is bit-identical regardless of which side a document lands
    * on (RepetitionSpec pins array ≡ explode on 5k-token docs).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, longDocTokens: Int = 256): DataFrame = {
    val toks = TextAnalysis.tokenCount(col(textCol))
    val gramsCol = ngrams(col(textCol), n)
    val base = docs.filter(toks >= n)
    // Short docs: ONE codegen'd pass per row (GramStats — exact integer
    // counters, no hash conflation). The previous HOF form
    // (transform(array_distinct, g => size(filter(…)))) evaluated O(grams²)
    // interpreted lambdas per row; at sf0.1's single-file scan that ran one
    // task for 2.2 s. Both forms divide the same exact integers, so the
    // branch routing stays bit-identical (RepetitionSpec pins all three
    // formulations equal).
    val st = graft.functions.TextHashExpressions.gramStats(col(textCol), n)
    val short = base.filter(toks < longDocTokens)
      .withColumn("__st", st)
      .withColumn("dupfrac", lit(1.0) -
        col("__st.ndistinct").cast("double") / col("__st.total"))
      .withColumn("topfrac",
        col("__st.top").cast("double") / col("__st.total"))
      .drop("__st")
    val long = base.filter(toks >= longDocTokens)
    val longStats = long.select(col(idCol), explode(gramsCol).as("__gram"))
      .groupBy(col(idCol), col("__gram")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol)).agg(
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("__cnt"))).as("dupfrac"),
        (max(col("__cnt")).cast("double") / sum(col("__cnt"))).as("topfrac"))
    short.unionByName(long.join(longStats, Seq(idCol)))
  }

  // ---- cross-document repeated spans (ExactSubstr-style screen) ------

  /** Cross-document repeated-span screen — the Spark shape of the
    * exact-substring dedup used on web-scale pretraining corpora (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models Better":
    * suffix-array ExactSubstr; here approximated with fixed-length token
    * windows, the standard distributed stand-in). Per document: how many of
    * its `n`-token windows also occur in at least one OTHER document.
    *
    * Shape: explode windows → two-level aggregation (count distinct docs
    * per span via (span, doc) pre-dedup — skew-safe: the inner groupBy
    * carries the doc key so no single span funnels a partition) → filter
    * cross-doc spans → semi-side join back per doc. All keyed equi-joins
    * and partial aggregations; nothing all-pairs, nothing driver-side.
    *
    * The span STRING never leaves the map side: every shuffle (the
    * distinct, the docs-per-span count, the join back) keys on
    * `xxhash64(span)` — 8 bytes/row instead of ~n·wordlen chars, which at
    * sf0.1 is already ~6× fewer shuffle bytes on the dominant stage and at
    * corpus scale is the difference between a network-bound and a
    * CPU-bound job. Collisions conflate two distinct spans with
    * probability ≈ m²/2⁶⁵ (m = distinct spans; at m = 10¹⁰ that is
    * ~0.003) — the standard accepted error of hash-keyed ExactSubstr
    * screens, and each collision can only ever OVERCOUNT n_repeated by
    * one window.
    *
    * Returns (idCol, n_windows, n_repeated): total windows and windows
    * shared with another document.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    // native one-pass gram hashing (GramHashes) — the transform(ngrams, …)
    // HOF chain materialized every span string through interpreted lambdas
    val win = docs
      .select(col(idCol),
        explode(graft.functions.TextHashExpressions.gramHashes(col(textCol), n))
          .as("__h"))
    // a doc repeating its own span twice must not count as cross-doc:
    // docs-per-span is computed over distinct (doc, hash). ONE pass over
    // the tokenized corpus (tokenize+explode is the dominant cost):
    // pre-aggregate occurrence counts per (doc, hash) — map-side partial
    // aggregation shrinks the explode volume before it ever shuffles —
    // then docs-per-span via groupBy + equi-join back, NOT a window: a
    // count-over-window partitioned on the hash must SORT AND BUFFER every
    // (doc, hash) row of a hot span in one un-splittable task (a
    // million-doc boilerplate span = a straggler), while the groupBy gets
    // map-side partials and the join's skewed partitions AQE can split.
    // The per-doc rollup weighs each span by its occurrence count.
    val perDocSpan = win.groupBy(col(idCol), col("__h"))
      .agg(count(lit(1)).as("__c"))
    val docsPerSpan = perDocSpan.groupBy("__h")
      .agg(count(lit(1)).as("__docs"))
    perDocSpan.join(docsPerSpan, "__h")
      .groupBy(idCol)
      .agg(sum(col("__c")).as("n_windows"),
        sum(when(col("__docs") >= 2, col("__c")).otherwise(lit(0L)))
          .as("n_repeated"))
  }

  // ---- paragraph-level dedup (MassiveText/Gopher pipeline op) --------

  /** Paragraph-level exact dedup (Rae et al. 2021 §A1.2 repetition
    * removal operates on sub-document units; C4 likewise dedups by
    * three-sentence span): split each document into paragraphs, keep ONE
    * representative per distinct normalized paragraph corpus-wide — the
    * winner is the (lowest doc id, lowest position) occurrence, a total
    * deterministic order. Returns (idCol, pos, para) of survivors.
    *
    * Shape: explode → one keyed min_by aggregation on the normalized
    * paragraph (partial-aggregated map-side; the struct min is
    * order-isomorphic to the (doc, pos) tuple order). No window over the
    * corpus, no driver loop.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\\. "): DataFrame = {
    val paras = docs.select(col(idCol),
        posexplode(split(col(textCol), sep)).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
      .withColumn("__norm", lower(trim(col("para"))))
    paras.groupBy("__norm")
      .agg(min_by(struct(col(idCol), col("pos"), col("para")),
        struct(col(idCol), col("pos"))).as("__w"))
      .select(col("__w")(idCol).as(idCol), col("__w")("pos").as("pos"),
        col("__w")("para").as("para"))
  }

  // ---- sequence packing ----------------------------------------------

  /** Concat-and-chunk sequence packing (the standard pretraining layout:
    * documents concatenated in a deterministic order and cut into fixed
    * token budgets); each document is assigned to the chunk where it
    * STARTS — bin = exclusive-prefix token count div budget, one window
    * cumsum, no driver loop. At 100 TB packing runs per shard (the order
    * key becomes (shard, idCol) and the window partitions by shard — no
    * global sort); the global-order form here is the oracle-checkable
    * core with identical per-chunk statistics.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // tok >= 1 exactly as in [[packSequencesSharded]] (NULL text must count
    // like empty text, not vanish from the prefix sums) — the two forms
    // must stay bin-identical per shard for the property spec's contract
    docs.select(col(idCol),
        greatest(coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"),
          lit(0L)), lit(1L)).as("tok"))
      .withColumn("bin",
        (coalesce(sum(col("tok")).over(w), lit(0L)) / budget).cast("long"))
  }

  /** The at-scale form of [[packSequences]]: packing runs independently PER
    * SHARD (window partitioned by `shardCol`, ordered by `idCol` within it —
    * no global sort, no single-partition exchange), and chunk ids are made
    * globally unique by offsetting each shard's local bins with the chunk
    * counts of the shards before it. The offsets come from ONE tiny
    * aggregate — per-shard token totals, shard-count-sized by construction —
    * collected and broadcast back; within a shard the output is identical to
    * running the global form on that shard alone (PackingPropertySpec pins
    * this, PlanSpec pins the no-single-partition plan shape).
    */
  def packSequencesSharded(docs: DataFrame, idCol: String, shardCol: String,
      textCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // every doc must count >= 1 token for the bin arithmetic below (the
    // offset formula's soundness depends on it): empty text already does
    // (split of "" is [""]), but NULL text yields a null count that the
    // window prefix and the shard totals would both SKIP — the doc would
    // still take a bin while contributing nothing to the offset math,
    // letting two shards share a bin id at an exact budget boundary
    val toks = docs.select(col(shardCol), col(idCol),
      greatest(coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"),
        lit(0L)), lit(1L)).as("tok"))
    val wLocal = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // shard-count-sized by construction: collecting it IS the "tiny
    // aggregate + broadcast", not a driver-side loop over data. A shard with
    // total tokens T occupies floor(max(T-1,0)/budget)+1 bins (every shard
    // with rows uses at least bin 0).
    val totals = toks.groupBy(col(shardCol)).agg(sum(col("tok")).as("__total"))
      .orderBy(col(shardCol)).collect()
    var acc = 0L
    val offsetRows = totals.map { r =>
      // a null shard would silently VANISH in the equi-join below
      // (null never equals null) — refuse instead of dropping documents
      require(!r.isNullAt(0),
        s"packSequencesSharded: null $shardCol - assign every document a shard")
      val row = org.apache.spark.sql.Row(r.get(0), acc)
      val total = if (r.isNullAt(1)) 0L else r.getLong(1)
      // bins used by a shard with T total tokens = floor(max(T-1,0)/budget)+1.
      // Sound because every document counts >= 1 token (split of "" is [""]),
      // so the LAST doc's exclusive prefix <= T-1 — a hypothetical 0-token
      // trailing doc at an exact budget boundary would need one more bin;
      // any future tokenizer change must preserve tok >= 1 or revisit this
      acc += math.max(total - 1L, 0L) / budget + 1L
      row
    }
    val offsets = docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(StructField(shardCol, toks.schema(shardCol).dataType),
        StructField("__offset", LongType))))
    toks.withColumn("__local",
        (coalesce(sum(col("tok")).over(wLocal), lit(0L)) / budget).cast("long"))
      .join(broadcast(offsets), Seq(shardCol))
      .withColumn("bin", col("__offset") + col("__local"))
      .drop("__offset", "__local")
  }

  // ---- corpus mixture control ----------------------------------------

  /** Deterministic mixture resampling: keep a document iff
    * `id mod 10 < rate` where `rate` is a per-group keep-rate column in
    * tenths — the reproducible hash-gate downsampling that rebalances a
    * corpus mix without materializing per-group samples. (At 100 TB the
    * gate is `xxhash64(id) mod 10` so correlated id ranges cannot bias
    * the kept set; the plain-modulo form keeps the DuckDB oracle
    * bit-identical.)
    */
  def mixtureGate(docs: DataFrame, idCol: String, rate: Column): DataFrame =
    docs.filter(pmod(col(idCol), lit(10)) < rate)
}
