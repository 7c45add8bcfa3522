package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.{Curation, Dedup, Ranking, Sampling, TextAnalysis}

/** Training-data pipeline operator coverage: dedup (exact / MinHash-LSH /
  * n-gram Jaccard), text analysis (tokens, quality, language ID,
  * fingerprint). Formulas are written identically in Spark and the oracle.
  */
object PipelineQueriesImpl {

  def defs: Seq[QueryDef] = Seq(

    // Exact dedup: the corpus unioned with a shifted copy of itself must
    // collapse back to one row per text with the minimum id kept.
    QueryDef(
      "q_dedup_exact",
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |)
        |SELECT min(doc_id) AS keep, count(*) AS n
        |FROM d GROUP BY text
        |ORDER BY keep NULLS FIRST""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exact(doubled, Seq("text"), "doc_id")
        .select("keep", "n")
        .orderBy("keep")
    },

    // End-to-end training-data ingest chain — the composition the pipeline
    // operators exist for: language-ID filter → quality (token count) filter
    // → exact dedup (keep min id) → per-source corpus stats, one declarative
    // plan (filters/dedup/agg all distribute; nothing driver-side).
    QueryDef(
      "q_pipeline_e2e",
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    len(string_split(text, ' ')) AS tokens,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('the','and','for','with') THEN 1 ELSE 0 END)) AS c_en,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('der','und','das','ein') THEN 1 ELSE 0 END)) AS c_de,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('el','los','que','una') THEN 1 ELSE 0 END)) AS c_es,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('le','les','des','une') THEN 1 ELSE 0 END)) AS c_fr
        |  FROM documents),
        |filtered AS (
        |  SELECT * FROM scored
        |  WHERE c_en >= greatest(c_en, c_de, c_es, c_fr) AND c_en > 0
        |    AND tokens >= 20),
        |kept AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY text)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(tokens) AS BIGINT) AS total_tokens
        |FROM filtered JOIN kept USING (doc_id)
        |GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin) { (s, dir) =>
      val filtered = Tables.documents(s, dir)
        .withColumn("guessed", TextAnalysis.langId(col("text")))
        .withColumn("tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("guessed") === "en" && col("tokens") >= 20)
      val kept = Dedup.exact(filtered.select(col("doc_id"), col("text")),
        Seq("text"), "doc_id").select(col("keep").as("doc_id"))
      filtered.join(kept, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("total_tokens"))
        .orderBy("source")
    },

    // Word-set (unigram) Jaccard similarity join >= 0.8.
    QueryDef(
      "q_word_jaccard",
      """WITH w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents WHERE doc_id < 40),
        |s AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |i AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
        |      FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, round(n * 1.0 / (x.sz + y.sz - n), 6) AS jac
        |FROM i JOIN s x ON i.d1 = x.doc_id JOIN s y ON i.d2 = y.doc_id
        |WHERE n * 1.0 / (x.sz + y.sz - n) >= 0.8
        |ORDER BY d1 NULLS FIRST, d2 NULLS FIRST""".stripMargin) { (s, dir) =>
      val words = Tables.documents(s, dir)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .distinct()
      val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = words.as("a")
        .join(words.as("b"),
          col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("jacRaw",
          col("n") * lit(1.0) / (col("sz1") + col("sz2") - col("n")))
        .filter(col("jacRaw") >= 0.8)
        .select(col("d1"), col("d2"), round(col("jacRaw"), 6).as("jac"))
        .orderBy("d1", "d2")
    },

    // PII redaction (standard curation screen): deterministically inject
    // emails/phones into a slice of the corpus, count + redact them with
    // codegen'd regex columns, and prove zero residual matches survive.
    QueryDef(
      "q_pii_redact",
      """WITH aug AS (
        |  SELECT doc_id,
        |         text
        |           || CASE WHEN doc_id % 7 = 0
        |                THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
        |           || CASE WHEN doc_id % 11 = 0
        |                THEN ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |           AS t
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_e,
        |         len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS n_p,
        |         regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                        '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS red
        |  FROM aug
        |)
        |SELECT CAST(count(CASE WHEN n_e > 0 THEN 1 END) AS BIGINT) AS docs_with_email,
        |       CAST(sum(n_e) AS BIGINT) AS emails,
        |       CAST(sum(n_p) AS BIGINT) AS phones,
        |       CAST(count(CASE WHEN len(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |                        + len(regexp_extract_all(red, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) > 0
        |                  THEN 1 END) AS BIGINT) AS residual_docs
        |FROM m""".stripMargin) { (s, dir) =>
      val aug = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-867-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("t"))
      val red = Curation.redact(col("t"))
      aug.agg(
        count(when(Curation.emailCount(col("t")) > 0, 1)).as("docs_with_email"),
        sum(Curation.emailCount(col("t"))).cast("long").as("emails"),
        sum(Curation.phoneCount(col("t"))).cast("long").as("phones"),
        count(when(Curation.emailCount(red) + Curation.phoneCount(red) > 0, 1))
          .as("residual_docs"))
    },

    // Rule-based quality filtering (the published Gopher heuristics, Rae et
    // al. 2021 §A1.1): per-language pass counts for each rule + the final
    // keep conjunction. Thresholds tightened to be discriminative on the
    // synthetic corpus.
    QueryDef(
      "q_gopher_rules",
      """WITH m AS (
        |  SELECT lang,
        |    len(string_split(text, ' ')) AS wc,
        |    list_sum(list_transform(string_split(text, ' '), w -> length(w))) * 1.0
        |      / greatest(len(string_split(text, ' ')), 1) AS mwl,
        |    list_sum(list_transform(string_split(text, ' '),
        |      w -> CASE WHEN regexp_matches(w, '[A-Za-z0-9]') THEN 0 ELSE 1 END)) AS symb,
        |    list_sum(list_transform(string_split(text, ' '),
        |      w -> CASE WHEN w IN ('the','a','of','and','to','in','is','it','for','on') THEN 1 ELSE 0 END)) AS stops
        |  FROM documents
        |), r AS (
        |  SELECT lang,
        |    wc BETWEEN 55 AND 100000 AS r_wc,
        |    mwl BETWEEN 2.0 AND 10.0 AS r_mwl,
        |    symb <= greatest(wc, 1) * 0.1 AS r_sym,
        |    stops >= 3 AS r_stop
        |  FROM m
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
        |       CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
        |       CAST(sum(CASE WHEN r_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_sym,
        |       CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |       CAST(sum(CASE WHEN r_wc AND r_mwl AND r_sym AND r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |FROM r GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      val t = col("text")
      Tables.documents(s, dir)
        .select(col("lang"),
          Curation.ruleWordCount(t, 55).as("r_wc"),
          Curation.ruleMeanWordLen(t).as("r_mwl"),
          Curation.ruleSymbolRatio(t).as("r_sym"),
          Curation.ruleStopwords(t, 3).as("r_stop"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(when(col("r_wc"), 1)).as("n_wc"),
          count(when(col("r_mwl"), 1)).as("n_mwl"),
          count(when(col("r_sym"), 1)).as("n_sym"),
          count(when(col("r_stop"), 1)).as("n_stop"),
          count(when(col("r_wc") && col("r_mwl") && col("r_sym") && col("r_stop"), 1))
            .as("n_keep"))
        .orderBy("lang")
    },

    // Benchmark decontamination (GPT-3 App. C / Gopher §A1.2 n-gram-overlap
    // screen): flag training docs sharing any n-gram with the held-out
    // benchmark slice (doc_id % 97 = 0) via a distinct-gram equi-join —
    // O(collisions), never all-pairs. Production uses 8-13-grams; the
    // synthetic corpus's 30-word vocabulary makes 3-grams the
    // demonstrative scale.
    QueryDef(
      "q_decontaminate",
      """WITH g AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t,
        |       UNNEST(range(0, greatest(len(w) - 2, 0))) AS u(i)
        |)
        |SELECT tr.doc_id AS doc_id, CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_hits
        |FROM g tr JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0) be USING (gram)
        |WHERE tr.doc_id % 97 <> 0
        |GROUP BY tr.doc_id
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Curation.contaminated(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 3)
        .select(col("doc_id"), col("n_hits").cast("long").as("n_hits"))
        .orderBy("doc_id")
    },

    // Corpus statistics per (lang, source).
    QueryDef(
      "q_doc_stats",
      """SELECT lang, source, count(*) AS n,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))
        .orderBy("lang", "source")
    },

    // Per-document quality metrics (token count, mean word length, stopword
    // ratio, composite score).
    QueryDef(
      "q_text_quality",
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS tokens,
        |       round(list_sum(list_transform(string_split(text, ' '), w -> length(w))) * 1.0
        |             / greatest(len(string_split(text, ' ')), 1), 6) AS awl,
        |       round(list_sum(list_transform(string_split(text, ' '),
        |             w -> CASE WHEN w IN ('the','a','of','and','to','in','is','it','for','on') THEN 1 ELSE 0 END)) * 1.0
        |             / greatest(len(string_split(text, ' ')), 1), 6) AS stop_ratio,
        |       round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
        |             + (list_sum(list_transform(string_split(text, ' '),
        |                w -> CASE WHEN w IN ('the','a','of','and','to','in','is','it','for','on') THEN 1 ELSE 0 END)) * 1.0
        |                / greatest(len(string_split(text, ' ')), 1)) * 0.3
        |             + least((list_sum(list_transform(string_split(text, ' '), w -> length(w))) * 1.0
        |                / greatest(len(string_split(text, ' ')), 1)) / 10.0, 1.0) * 0.2, 6) AS quality
        |FROM documents
        |WHERE doc_id < 60
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 60)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("tokens"),
          round(TextAnalysis.avgWordLen(col("text")), 6).as("awl"),
          round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // Heuristic language ID via marker lexicons, cross-tabbed against the
    // dataset's own lang column.
    QueryDef(
      "q_langid",
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('the','and','for','with') THEN 1 ELSE 0 END)) AS c_en,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('der','und','das','ein') THEN 1 ELSE 0 END)) AS c_de,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('el','los','que','una') THEN 1 ELSE 0 END)) AS c_es,
        |    list_sum(list_transform(string_split(text,' '), w -> CASE WHEN w IN ('le','les','des','une') THEN 1 ELSE 0 END)) AS c_fr
        |  FROM documents WHERE doc_id < 80)
        |SELECT doc_id, lang,
        |  CASE WHEN c_en >= greatest(c_en, c_de, c_es, c_fr) AND c_en > 0 THEN 'en'
        |       WHEN c_de >= greatest(c_en, c_de, c_es, c_fr) AND c_de > 0 THEN 'de'
        |       WHEN c_es >= greatest(c_en, c_de, c_es, c_fr) AND c_es > 0 THEN 'es'
        |       WHEN c_fr >= greatest(c_en, c_de, c_es, c_fr) AND c_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS guessed
        |FROM scored
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 80)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("guessed"))
        .orderBy("doc_id")
    },

    // Order-sensitive document fingerprint (rolling-hash style).
    QueryDef(
      "q_fingerprint",
      """SELECT doc_id,
        |       CAST(list_sum(list_transform(range(len(string_split(text, ' '))),
        |         i -> (i + 1) * length(string_split(text, ' ')[i + 1]) * (1 + (i * 7) % 13)))
        |         % 2147483647 AS BIGINT) AS fp
        |FROM documents
        |WHERE doc_id < 60
        |ORDER BY doc_id NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 60)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // Real image decode (javax.imageio.ImageIO, JDK builtin): doc_ids become
    // constant-gray PNGs via the real PNG ENCODER, then decode back through
    // the real DECODER — width/height/pixel-count/mean-luma are all
    // SQL-predictable because PNG is lossless and the fixture is
    // deterministic. Exercises the per-partition batch decode shape
    // (Multimodal.decodeImageMeta) end-to-end with genuine codec bytes.
    QueryDef(
      "q_multimodal_decode",
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |       CAST(2 + doc_id % 5 AS INT) AS width,
        |       CAST(3 + doc_id % 4 AS INT) AS height,
        |       CAST((2 + doc_id % 5) * (3 + doc_id % 4) AS BIGINT) AS npixels,
        |       CAST(20 + doc_id % 200 AS BIGINT) AS gray
        |FROM documents WHERE doc_id <= 40
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val imgs = graft.pipeline.Multimodal.documentsAsImages(s, dir, cap = 40L)
      graft.pipeline.Multimodal.decodeImageMeta(imgs, "id", "bytes")
        .select(col("id"), col("width"), col("height"), col("npixels"),
          round(col("mean_lum")).cast("long").as("gray"))
        .orderBy("id")
    },

    // Real audio decode (javax.sound.sampled.AudioSystem, JDK builtin):
    // doc_ids become constant-amplitude 16-bit mono WAVs via the real WAV
    // ENCODER, then decode back through the real DECODER —
    // rate/frames/duration/RMS all SQL-predictable because PCM is lossless
    // and amp/32768 is a power-of-two division (exact in floating point).
    // The audio twin of q_multimodal_decode (Multimodal.decodeAudioMeta).
    QueryDef(
      "q_audio_decode",
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
        |       round((100 + doc_id % 50) / 8000.0, 6) AS duration_s,
        |       round((20 + doc_id % 200) * 100 / 32768.0, 6) AS rms
        |FROM documents WHERE doc_id <= 40
        |ORDER BY id NULLS FIRST""".stripMargin) { (s, dir) =>
      val wavs = graft.pipeline.Multimodal.documentsAsAudio(s, dir, cap = 40L)
      graft.pipeline.Multimodal.decodeAudioMeta(wavs, "id", "bytes")
        .select(col("id"), col("sample_rate"), col("channels"), col("n_frames"),
          round(col("duration_s"), 6).as("duration_s"),
          round(col("rms"), 6).as("rms"))
        .orderBy("id")
    },

    // RETIRED gate row `q_minhash_neardup` (was QueryDef.noOracle): at a
    // mid-threshold banding (bands=8 of 16 hashes) LSH recall is
    // signature-dependent — DuckDB cannot reproduce xxhash64 banding, so the
    // driver could only ever check rows>0, and the row read as non-green on
    // every dashboard. The SAME pipeline (signature → band → exact-Jaccard
    // verify, Dedup.minHashNearDuplicates) is now proven end-to-end against
    // a FULL exact all-pairs oracle by `q_neardup_verified` below (r=1
    // banding makes candidate generation lossless on the planted fixture,
    // so the hash must match, and does). Mid-threshold recall ("minhash
    // finds planted near-duplicate") and verified⊆exact soundness
    // ("mid-threshold output is sound") are asserted in DedupSpec
    // (PipelineSpec.scala).

    // MinHash-LSH near-dup with a FULL exact oracle: plant ~0.8-jaccard
    // near-duplicates (80%-prefix truncation — prefix shingles are a
    // subset, so the pair's jaccard is |prefix|/|full|), run the real
    // signature→band→verify pipeline at r=1 (bands = numHashes, the
    // high-recall banding: a pair is missed only if ALL 16 independent
    // minhashes disagree — P ≈ (1−s)^16 ≈ 7e-12 at s = 0.8, and the
    // fixed fixture makes the outcome deterministic), and verify with
    // exact jaccard. The oracle computes exact 2-gram jaccard over ALL
    // pairs directly — candidate generation must therefore be lossless
    // on this fixture, proving the pipeline end-to-end, not rows-only.
    QueryDef(
      "q_neardup_verified",
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents WHERE doc_id < 150
        |),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(w[1 : GREATEST(CAST(floor(len(w)*4/5) AS INT), 3)], ' ') AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
        |),
        |d AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d)
        |  WHERE len(w) >= 2
        |),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |         round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |               / greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |)
        |SELECT id1, id2, jac FROM pairs WHERE jac >= 0.5
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      val base = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val ws = split(col("text"), " ")
      val k = greatest(floor(size(ws) * 4 / 5).cast("int"), lit(3))
      val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), k)).as("text"))
      Dedup.minHashNearDuplicates(base.unionByName(planted), "doc_id", "text",
          n = 2, numHashes = 16, bands = 16, threshold = 0.5)
        .orderBy("id1", "id2")
    },

    // Epochs CDC → Structured Streaming → incremental near-dup
    // (streaming/CdcStreams.scala): the SAME corpus as q_neardup_verified
    // arrives over TWO epoch commits (base, then base + planted); the
    // commits' change rows stream from the _cdc outbox and ONE
    // Trigger.AvailableNow catch-up run drains everything committed since
    // the checkpoint, signing only the changed documents and band-joining
    // against the persisted signature store. The accumulated pairs must
    // equal the full exact all-pairs oracle on the epoch head — proving
    // the CDC path end-to-end under the driver's gate. (Run-to-run
    // incrementality — a SECOND run signing only the later commit's delta —
    // is pinned in CdcStreamsSpec; a second streaming lifecycle here would
    // re-pay ~2 s of start/checkpoint/stop machinery per bench run for no
    // extra oracle coverage.)
    QueryDef(
      "q_cdc_neardup",
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents WHERE doc_id < 150
        |),
        |planted AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(w[1 : GREATEST(CAST(floor(len(w)*4/5) AS INT), 3)], ' ') AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
        |),
        |d AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d)
        |  WHERE len(w) >= 2
        |),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |         round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |               / greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |)
        |SELECT id1, id2, jac FROM pairs WHERE jac >= 0.5
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array => sqlArray}
      // checkpoint the tiny base ONCE: it feeds both commits' snapshots,
      // feeds, and delta diffs (~6 consumers) — without it each re-scans
      // the documents parquet
      val base = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .localCheckpoint()
      val ws = split(col("text"), " ")
      val k = greatest(floor(size(ws) * 4 / 5).cast("int"), lit(3))
      val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), k)).as("text"))
      def asGraph(docs: org.apache.spark.sql.DataFrame) =
        graft.graph.PropertyGraph(
          docs.select(col("doc_id").as("id"),
            sqlArray(lit("Document")).as("labels"), col("text")),
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("src",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("dst",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("rel",
                org.apache.spark.sql.types.StringType)))))
      val store = java.nio.file.Files.createTempDirectory("graft_cdcq_store").toString
      val work = java.nio.file.Files.createTempDirectory("graft_cdcq_work").toString
      graft.streaming.CdcStreams.commitWithFeed(asGraph(base), store)
      // the producer just committed epoch 0 and still holds it in memory —
      // pass it as the delta base so the commit skips the parquet read-back
      graft.streaming.CdcStreams.commitWithFeed(
        asGraph(base.unionByName(planted)), store,
        prevGraph = Some(asGraph(base)))
      graft.streaming.CdcStreams.incrementalNearDupRun(s, store, work,
        idCol = "id", textCol = "text")
      graft.streaming.CdcStreams.nearDupPairs(s, work)
        .select(col("id1"), col("id2"), col("jac"))
        .orderBy("id1", "id2")
    },

    // MinHash-LSH at threshold 1.0 IS oracle-exact: jaccard = 1 means equal
    // shingle sets, equal sets hash to identical signatures and bands, so
    // every qualifying pair collides with probability 1 and verification
    // keeps exactly the equal-set pairs. Exact copies are planted by
    // doubling the table (same pattern as q_dedup_exact); the oracle finds
    // equal 3-gram sets directly.
    QueryDef(
      "q_minhash_exactdup",
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
        |sig AS (
        |  SELECT doc_id, len(w) AS nw,
        |         array_to_string(list_sort(list_distinct(list_transform(
        |           range(1, greatest(len(w) - 1, 1)),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))), chr(31)) AS s
        |  FROM ws)
        |SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(1.0 AS DOUBLE) AS jac
        |FROM sig a JOIN sig b ON a.s = b.s AND a.doc_id < b.doc_id
        |WHERE a.nw >= 3
        |ORDER BY id1 NULLS FIRST, id2 NULLS FIRST""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // bands auto-derives to 1 at threshold 1.0: one band of the full
      // signature is recall-1 for equal shingle sets with the smallest
      // candidate join (8×2-hash bands here collided merely-similar docs
      // and inflated the self-join ~10×)
      Dedup.minHashNearDuplicates(doubled, "doc_id", "text",
          n = 3, numHashes = 16, threshold = 1.0)
        .orderBy("id1", "id2")
    },

    // TF-IDF weighting (smoothed idf): top-3 terms per document for a
    // 10-doc slice, ranked on the ROUNDED score so float ulp noise cannot
    // flip ties; term asc breaks exact ties identically on both sides.
    QueryDef(
      "q_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |         round(tf.tf * (ln((n.n + 1.0) / (dfx.df + 1.0)) + 1.0), 6) AS score
        |  FROM tf, dfx, n WHERE tf.term = dfx.term
        |),
        |ranked AS (
        |  SELECT doc_id, term, tf, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM scored WHERE doc_id < 10
        |)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id NULLS FIRST, score DESC, term NULLS FIRST""".stripMargin) { (s, dir) =>
      val scored = Ranking.tfidf(Tables.documents(s, dir), "doc_id", "text")
        .filter(col("doc_id") < 10)
        .withColumn("score", round(col("score"), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("score"))
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    },

    // BM25 retrieval (k1=1.2, b=0.75): top-10 documents for a 3-term
    // bag-of-words query, scores rounded before the ranking cut.
    QueryDef(
      "q_bm25",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) * 1.0 AS dl FROM tok2 GROUP BY 1),
        |dfx AS (
        |  SELECT term, ln(1.0 + ((SELECT count(*) * 1.0 FROM documents) - count(*) + 0.5)
        |                        / (count(*) + 0.5)) AS idf
        |  FROM tf WHERE term IN ('spark', 'vector', 'query') GROUP BY term
        |)
        |SELECT tf.doc_id AS doc_id,
        |       round(sum(dfx.idf * (tf.tf * (1.2 + 1)) /
        |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avg(dl) FROM dl)))), 4) AS score
        |FROM tf JOIN dfx ON tf.term = dfx.term JOIN dl ON tf.doc_id = dl.doc_id
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, tf.doc_id NULLS FIRST
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Ranking.bm25(Tables.documents(s, dir), "doc_id", "text",
          Seq("spark", "vector", "query"))
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },

    // Deterministic hash sampling (portable multiplicative hash — the
    // SAME rows are kept by the DuckDB oracle evaluating the identical
    // integer arithmetic): ~20% per language stratum with no per-stratum
    // pass, membership stable under repartitioning and append.
    QueryDef(
      "q_sample",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n
        |FROM documents
        |WHERE ((doc_id * 2654435761) % 1000000007) % 1000 < 200
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      Sampling.sampleByKey(Tables.documents(s, dir), "doc_id", 200)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // Exact proportional stratified sample: each language keeps exactly
    // ceil(n_lang * 20%) rows (hash-ranked inside the stratum).
    QueryDef(
      "q_sample_exact",
      """SELECT lang, CAST(ceil(count(*) * 200 / 1000.0) AS BIGINT) AS n
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      Sampling.stratifiedExact(Tables.documents(s, dir), "lang", "doc_id", 200)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // Deterministic train/test split: disjoint and exhaustive by
    // construction, ~10% test, reproducible from the key alone.
    QueryDef(
      "q_split",
      """SELECT part, n FROM (
        |  SELECT 'test' AS part,
        |         CAST(count(*) FILTER (WHERE ((doc_id * 2654435761) % 1000000007) % 1000 < 100) AS BIGINT) AS n
        |  FROM documents
        |  UNION ALL
        |  SELECT 'train',
        |         count(*) FILTER (WHERE ((doc_id * 2654435761) % 1000000007) % 1000 >= 100)
        |  FROM documents
        |)
        |ORDER BY part NULLS FIRST""".stripMargin) { (s, dir) =>
      val (train, test) = Sampling.trainTestSplit(
        Tables.documents(s, dir), "doc_id", 100)
      import s.implicits._
      Seq(("test", test.count()), ("train", train.count()))
        .toDF("part", "n").orderBy("part")
    },

    // Concat-and-chunk sequence packing (Curation.packSequences): documents
    // in doc_id order are conceptually concatenated and cut into 512-token
    // chunks; each doc lands in the chunk where it starts. One window
    // cumsum — the pretraining batch-layout op as a single declarative
    // plan, per-chunk stats oracle-checked.
    QueryDef(
      "q_seq_packing",
      """SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(tok) AS BIGINT) AS toks
        |FROM (
        |  SELECT doc_id, tok,
        |         CAST(floor(COALESCE(SUM(tok) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           / 512.0) AS BIGINT) AS bin
        |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents)
        |)
        |GROUP BY bin
        |ORDER BY bin NULLS FIRST""".stripMargin) { (s, dir) =>
      Curation.packSequences(Tables.documents(s, dir), "doc_id", "text", 512)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
        .orderBy("bin")
    },

    // The at-scale packing form: per-shard windows (no global sort / no
    // single-partition exchange — PlanSpec pins it) with globally unique
    // chunk ids via shard-count-sized offsets. The oracle re-derives the
    // same two-level scheme in SQL.
    QueryDef(
      "q_seq_packing_sharded",
      """WITH toks AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |         len(string_split(text, ' ')) AS tok
        |  FROM documents
        |), offsets AS (
        |  SELECT shard,
        |         COALESCE(SUM(CAST(floor(greatest(SUM(tok) - 1, 0) / 512.0) AS BIGINT) + 1)
        |           OVER (ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM toks GROUP BY shard
        |), local AS (
        |  SELECT shard, doc_id, tok,
        |         CAST(floor(COALESCE(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS local_bin
        |  FROM toks
        |)
        |SELECT CAST(l.local_bin + o.off AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(l.tok) AS BIGINT) AS toks
        |FROM local l JOIN offsets o USING (shard)
        |GROUP BY 1
        |ORDER BY bin NULLS FIRST""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      Curation.packSequencesSharded(docs, "doc_id", "shard", "text", 512)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
        .orderBy("bin")
    },

    // Cross-document repeated-span screen (Curation.repeatedSpans — the
    // distributed stand-in for suffix-array ExactSubstr dedup, Lee et al.
    // 2022): per-lang window totals, windows shared across documents, and
    // documents carrying any shared span.
    QueryDef(
      "q_substr_spans",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, lang, unnest(list_transform(range(1, len(w) - 6),
        |      i -> array_to_string(w[i : i+7], ' '))) AS span
        |  FROM t WHERE len(w) >= 8
        |),
        |cd AS (
        |  SELECT span FROM (SELECT DISTINCT doc_id, span FROM wins)
        |  GROUP BY span HAVING count(*) >= 2
        |),
        |per_doc AS (
        |  SELECT w.doc_id, w.lang, count(*) AS nw,
        |         sum(CASE WHEN w.span IN (SELECT span FROM cd) THEN 1 ELSE 0 END) AS nr
        |  FROM wins w GROUP BY 1, 2
        |)
        |SELECT lang, CAST(sum(nw) AS BIGINT) AS n_win,
        |       CAST(sum(nr) AS BIGINT) AS n_rep,
        |       CAST(count(*) FILTER (WHERE nr > 0) AS BIGINT) AS n_docs_hit
        |FROM per_doc GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Curation.repeatedSpans(docs, "doc_id", "text", n = 8)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(sum(col("n_windows")).as("n_win"),
          sum(col("n_repeated")).as("n_rep"),
          sum(when(col("n_repeated") > 0, 1L).otherwise(0L)).as("n_docs_hit"))
        .orderBy(col("lang").asc_nulls_first)
    },

    // Paragraph-level exact dedup (Curation.dedupParagraphs — the
    // MassiveText/C4 sub-document dedup unit): one deterministic winner
    // per distinct normalized paragraph, chosen by (doc_id, pos).
    QueryDef(
      "q_para_dedup",
      """WITH p AS (
        |  SELECT doc_id, u.pos, u.para FROM (
        |    SELECT doc_id, unnest(list_transform(ps,
        |        (x, i) -> struct_pack(pos := i - 1, para := x))) AS u
        |    FROM (SELECT doc_id, string_split(text, '. ') AS ps FROM documents)
        |  ) WHERE len(trim(u.para)) > 0
        |),
        |w AS (
        |  SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY lower(trim(para))
        |                            ORDER BY doc_id, pos) AS rn
        |  FROM p
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_paras,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(sum(pos) AS BIGINT) AS pos_sum
        |FROM w WHERE rn = 1""".stripMargin) { (s, dir) =>
      Curation.dedupParagraphs(Tables.documents(s, dir), "doc_id", "text")
        .agg(count(lit(1)).as("n_paras"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("pos")).as("pos_sum"))
    },

    // Vocabulary construction: exact global term counts (partial-agg
    // shuffle on term) with a deterministic (count desc, term) top-k — the
    // tokenizer-training prep op. VocabSpec cross-checks a count-min-sketch
    // estimate against these exact counts (the sketch is the 100 TB path
    // when the term domain outgrows a shuffle).
    QueryDef(
      "q_vocab_topk",
      """SELECT term, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term
        |ORDER BY n DESC, term NULLS FIRST
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc_nulls_first)
        .limit(20)
    },

    // Corpus mixture control (Curation.mixtureGate): rebalance the language
    // mix with a deterministic keep-gate (en 10/10, zh 5/10, rest 7/10) and
    // report the retained per-language counts + token volume.
    QueryDef(
      "q_source_mix",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |FROM documents
        |WHERE doc_id % 10 < (CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 5 ELSE 7 END)
        |GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      val rate = when(col("lang") === "en", 10)
        .when(col("lang") === "zh", 5).otherwise(7)
      Curation.mixtureGate(Tables.documents(s, dir), "doc_id", rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(graft.pipeline.TextAnalysis.tokenCount(col("text")).cast("long")).as("toks"))
        .orderBy(col("lang").asc_nulls_first)
    },

    // Within-document repetition screens (Gopher §A1.1 rules 5-8 family:
    // duplicate-n-gram fraction and most-frequent-n-gram occupancy) — per-
    // lang counts of documents over each threshold. Curation.repetitionStats
    // routes short docs through pure array expressions and long docs
    // (≥256 words) through the explode + two-level aggregation, so a real
    // web corpus never pays the O(grams²) array-form top-gram count
    // (RepetitionSpec pins the two forms bit-identical).
    QueryDef(
      "q_rep_rules",
      """WITH g AS (
        |  SELECT doc_id, lang,
        |         list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS grams
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 2
        |), f AS (
        |  SELECT doc_id, lang,
        |    1.0 - len(list_distinct(grams)) * 1.0 / len(grams) AS dupfrac,
        |    list_max(list_transform(list_distinct(grams),
        |      gg -> len(list_filter(grams, x -> x = gg)))) * 1.0 / len(grams) AS topfrac
        |  FROM g)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN dupfrac > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       CAST(sum(CASE WHEN topfrac > 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS n_top
        |FROM f GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      Curation.repetitionStats(Tables.documents(s, dir), "doc_id", "text", n = 2)
        .select(col("lang"), col("dupfrac"), col("topfrac"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("dupfrac") > 0.05, 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("topfrac") > 0.06, 1L).otherwise(0L)).as("n_top"))
        .orderBy(col("lang").asc_nulls_first)
    },
  )
}
