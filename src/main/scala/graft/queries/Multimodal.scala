package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: SURVEY.md §2.11 ✦. Media are opaque
  * `binary` payloads with typed metadata; decode / feature-extract runs as
  * a typed `mapPartitions` batch over the bytes (the Scala counterpart of
  * a Pandas-UDF `mapInPandas` stage). No media libraries ship in this
  * environment, so the "decoder" is a deterministic stub over the payload
  * bytes — the Spark-side contract (schema, batching, partition-local
  * execution, no driver collect) is the real, tested part.
  *
  * Scale notes (100 TB): payloads never leave their partition; the decode
  * stage is narrow (no shuffle) and streams an iterator — constant memory
  * per task regardless of corpus size. Real decoders slot into
  * `decodeStub` unchanged.
  */
object Multimodal extends Q.Module {

  /** Stub "decoder": deterministic features from raw payload bytes. */
  private def decodeStub(docId: Long, payload: Array[Byte]): (Long, Long, Int, Int, Long) = {
    val n = payload.length.toLong
    // Fake dimensions a real image decoder would produce from the header.
    val w = (n % 640).toInt
    val h = ((n * 7) % 480).toInt
    var headSum = 0L
    var i = 0
    while (i < 16 && i < payload.length) { headSum += payload(i) & 0xff; i += 1 }
    (docId, n, w, h, headSum)
  }

  // --- q55: binary payload ingestion + partition-local feature extraction.
  private val q55 = Q(
    "q55_multimodal_decode",
    "✦ multimodal: binary payload → mapPartitions decode-stub features",
    (s, d) => {
      import s.implicits._
      // fanOut: one fixture parquet file = one split; the typed decode
      // stage must fan out across cores (round-1 bench: 10 s). On a
      // multi-file lake fanOut is the identity — no added shuffle.
      val bin = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
        .toDF("doc_id", "n_bytes", "fake_w", "fake_h", "head_sum")
        .orderBy(col("doc_id"))
    },
    // The fixture text is pure ASCII, so byte features are recomputable
    // from the string in DuckDB: strlen = bytes, ascii(char) = byte value.
    Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      CAST(strlen(text) % 640 AS INT) AS fake_w,
      CAST((strlen(text) * 7) % 480 AS INT) AS fake_h,
      CAST(list_sum(list_transform(generate_series(1, LEAST(16, strlen(text))),
        k -> ascii(substr(text, k, 1)))) AS BIGINT) AS head_sum
    FROM documents ORDER BY doc_id"""))

  // --- q56: frame sampling over a binary stream — slice the payload into
  //     fixed-size "frames", keep every 4th, checksum each kept frame.
  //     The audio/video analog of q55; pure byte plumbing, fully checked.
  private val q56 = Q(
    "q56_multimodal_frames",
    "✦ multimodal: fixed-size frame split + stride sampling + checksum",
    (s, d) => {
      import s.implicits._
      val frameLen = 64
      val bin = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions(_.flatMap { case (id, payload) =>
        payload.grouped(frameLen).zipWithIndex.collect {
          case (frame, idx) if idx % 4 == 0 =>
            (id, idx, frame.length, frame.foldLeft(0L)((a, b) => a + (b & 0xff)))
        }
      })
        .toDF("doc_id", "frame_idx", "frame_len", "frame_sum")
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH f AS (
      SELECT doc_id, text, unnest(generate_series(0, (strlen(text) - 1) // 64)) AS frame_idx
      FROM documents)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      CAST(LEAST(64, strlen(text) - frame_idx * 64) AS INT) AS frame_len,
      CAST(list_sum(list_transform(
        generate_series(1, LEAST(64, strlen(text) - frame_idx * 64)),
        k -> ascii(substr(text, frame_idx * 64 + k, 1)))) AS BIGINT) AS frame_sum
    FROM f WHERE frame_idx % 4 = 0
    ORDER BY doc_id, frame_idx"""))

  // --- q81: the multimodal JOIN shape from SURVEY §2.11 — text columns
  //     and embedding vectors side by side on doc_id = vec_id, with per-
  //     modality features in one frame (the "multimodal record" a training
  //     pipeline materializes). Inner join: at sf0.1 embeddings cover only
  //     part of documents (FIXTURES.md), which is the realistic shape.
  private val q81 = Q(
    "q81_multimodal_join",
    "✦ multimodal record: documents ⋈ embeddings, text + vector features",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          col("label"),
          size(col("embedding")).cast("long").as("n_dims"),
          sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, v) => acc + v.cast("double") * v.cast("double"))).as("l2"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang,
      len(text) AS n_chars,
      len(string_split(text, ' ')) AS n_words,
      label, len(embedding) AS n_dims,
      SQRT(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
    FROM documents JOIN embeddings ON doc_id = vec_id
    ORDER BY doc_id"""))

  // --- q133: TOLERANT DECODE with failure accounting — real corpora
  //     contain truncated/corrupt media, and a decoder that throws kills
  //     the whole task (and with it, at 100 TB, the job). The decode
  //     stage therefore returns a STATUS per record instead of throwing:
  //     invalid payloads (here: shorter than the 16-byte "header") yield
  //     ok=false with null features, valid ones decode normally, and the
  //     per-doc status column is the audit trail quality dashboards
  //     aggregate. Corruption is synthesized deterministically (every
  //     11th doc truncated to 10 bytes) so the failure path is
  //     non-vacuous and oracle-checkable. Same narrow, partition-local
  //     mapPartitions shape as q55 — tolerance adds zero shuffles.
  private val q133 = Q(
    "q133_multimodal_tolerant",
    "✦ multimodal: tolerant decode — corrupt payloads audited, not thrown",
    (s, d) => {
      import s.implicits._
      val bin = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          encode(when(col("doc_id") % 11 === 0, substring(col("text"), 1, 10))
            .otherwise(col("text")), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions(_.map { case (id, payload) =>
        if (payload.length < 16) (id, false, None: Option[Long], None: Option[Long])
        else {
          val (_, n, _, _, headSum) = decodeStub(id, payload)
          (id, true, Some(n), Some(headSum))
        }
      }).toDF("doc_id", "ok", "n_bytes", "head_sum")
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN substr(text, 1, 10) ELSE text END AS p
      FROM documents)
    SELECT doc_id, strlen(p) >= 16 AS ok,
      CASE WHEN strlen(p) >= 16 THEN CAST(strlen(p) AS BIGINT) END AS n_bytes,
      CASE WHEN strlen(p) >= 16 THEN
        CAST(list_sum(list_transform(generate_series(1, 16),
          k -> ascii(substr(p, k, 1)))) AS BIGINT) END AS head_sum
    FROM t ORDER BY doc_id"""))

  // --- q312: MODALITY-COVERAGE AUDIT — multimodal pipelines die
  //     quietly when one modality's job lags: text lands, embeddings
  //     don't, and the training join silently shrinks. This audits the
  //     text↔embedding alignment: per-source document coverage (does
  //     each doc have its vector?) plus the global orphan count on the
  //     embedding side. The fixture aligns 1:1 by construction, so a
  //     FAILED-JOB INJECTION (embeddings with vec_id % 7 = 0 dropped —
  //     the q94/q97 idiom) makes the coverage gap real (~6/7) and the
  //     outputs non-degenerate. Shape: one left join doc→embedding
  //     (the embedding-id frame collapses to one column and
  //     broadcasts), one conditional-sum rollup per source; the orphan
  //     leg is an anti-join the other way. The 100 TB audit is exactly
  //     this plan with both sides partitioned by the id.
  private val q312 = Q(
    "q312_modality_coverage",
    "✦ multimodal ops: text↔embedding coverage per source + orphan vectors (failed-job injection)",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      // Injection: simulate a partially-failed embedding job.
      val emb = Tables.embeddings(s, d).select(col("vec_id"))
        .filter(col("vec_id") % 7 =!= 0)
      val cov = docs
        .join(broadcast(emb.withColumn("has", lit(1L))),
          col("doc_id") === col("vec_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("has"), lit(0L))).as("n_embedded"))
      val orphans = emb.join(docs, col("vec_id") === col("doc_id"),
          "left_anti")
        .agg(count(lit(1)).as("n_orphan_vectors"))
      cov.crossJoin(broadcast(orphans))
        .select(col("source"), col("n_docs"), col("n_embedded"),
          (col("n_docs") - col("n_embedded")).as("n_missing"),
          graft.dsl.fpTrunc(col("n_embedded").cast("double")
            / col("n_docs").cast("double"), 9).as("coverage"),
          col("n_orphan_vectors"))
        .orderBy(col("source"))
    },
    Some(s"""WITH emb AS (
      SELECT vec_id FROM embeddings WHERE vec_id % 7 != 0),
    cov AS (SELECT d.source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_embedded
      FROM documents d LEFT JOIN emb e ON d.doc_id = e.vec_id
      GROUP BY 1),
    orph AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_vectors
      FROM emb WHERE NOT EXISTS (
        SELECT 1 FROM documents d WHERE d.doc_id = emb.vec_id))
    SELECT source, n_docs, n_embedded,
      CAST(n_docs - n_embedded AS BIGINT) AS n_missing,
      ${graft.dsl.fpTruncSql(
        "CAST(n_embedded AS DOUBLE) / CAST(n_docs AS DOUBLE)",
        9)} AS coverage,
      n_orphan_vectors
    FROM cov, orph ORDER BY source"""))

  def defs: Seq[Q] = Seq(q55, q56, q81, q133, q312)
}
