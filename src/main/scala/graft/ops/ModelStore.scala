package graft.ops

import java.nio.file.{Files, Path}

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted trained-model artifacts: the seam between "trains and
  * serves in one job" and "a model you can ship".
  *
  * Every trained artifact in the repo (BPE merges, WordPiece/Unigram
  * vocabularies, NB weights, k-means centroids, PQ codebooks) is
  * memoized per (session, dataset) — rebuilt from the corpus on first
  * touch in every new session. A real pipeline trains ONCE, persists
  * the artifact, and serves it from storage in every later job.
  * ModelStore is that write/read path: a model table lands as parquet
  * plus a MANIFEST.json carrying (kind, row count, schema DDL, content
  * fingerprint), and load() verifies all three before handing the
  * frame to the existing size-gated joins ([[Distributed.modelJoin]]).
  *
  * Design points, in scale order:
  *  - The manifest row count is what feeds the serving join's size
  *    gate — a cold session never runs a count() job (or worse, a
  *    training pass) to decide broadcast vs shuffle; the decision
  *    rides the artifact.
  *  - The fingerprint is ORDER-INDEPENDENT (an exact DECIMAL(38,0)
  *    sum of per-row xxhash64 over the name-sorted column struct), so
  *    a parquet round-trip that reshuffles row order still verifies,
  *    while a dropped/duplicated/corrupted row fails loudly at load
  *    time rather than silently mis-serving.
  *  - Verification cost is one scan of the MODEL table — model-sized
  *    (at worst a vocabulary, Heaps-sublinear in the corpus), never
  *    corpus-sized.
  *  - No driver materialization anywhere in the path: save() writes
  *    the frame's own partitions; load() returns a localCheckpoint-
  *    pinned frame. Whether the model then broadcasts or shuffle-joins
  *    is the measured gate's choice, same as an in-session model; a
  *    stored ABOVE-threshold model goes storage → join build side
  *    without touching the driver (e.g. [[Bpe.tableFormCountsDf]]).
  *
  * The reference has no analog — its host engine owns table
  * persistence — so this surface is specified by the LLM-pipeline
  * brief instead: the three q_model_artifact_* queries each train,
  * persist, load, and serve through the SAME gated join their
  * in-session twin uses, and ModelStoreSpec proves a FRESH
  * SparkSession (new SparkContext, empty artifact memo) re-serves the
  * stored model bit-identically to a retrain — without the training
  * memo key ever appearing.
  */
object ModelStore {

  /** What MANIFEST.json carries. `fingerprint` is the decimal string
    * of the exact row-hash sum; `schemaDdl` pins column names/types.
    */
  final case class Manifest(kind: String, rows: Long, fingerprint: String,
      schemaDdl: String)

  /** Order-independent content fingerprint: Σ xxhash64(name-sorted
    * column struct) carried exactly in DECIMAL(38,0) (a BIGINT sum
    * would wrap and, under ANSI mode, throw on large vocabularies).
    */
  private def fingerprintOf(df: DataFrame): (Long, String) = {
    val row = df
      .agg(count(lit(1)).as("n"),
        sum(xxhash64(struct(df.columns.sorted.map(col): _*))
          .cast("decimal(38,0)")).as("fp"))
      .collect()(0)
    val fp = Option(row.getDecimal(1))
      .map(_.toBigInteger.toString).getOrElse("0")
    (row.getLong(0), fp)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Persist `df` under `dir` (parquet + MANIFEST.json). The manifest
    * is computed by re-reading what landed ON DISK, so it attests the
    * stored bytes, not the in-memory frame that produced them.
    */
  def save(df: DataFrame, dir: Path, kind: String): Manifest = {
    val data = dir.resolve("data")
    df.write.mode("overwrite").parquet(data.toString)
    val stored = df.sparkSession.read.parquet(data.toString)
    val (rows, fp) = fingerprintOf(stored)
    val m = Manifest(kind, rows, fp, stored.schema.toDDL)
    Files.write(dir.resolve("MANIFEST.json"),
      (s"""{"kind": "${esc(m.kind)}", "rows": ${m.rows}, """ +
        s""""fingerprint": "${m.fingerprint}", """ +
        s""""schema": "${esc(m.schemaDdl)}"}""").getBytes("UTF-8"))
    m
  }

  private def field(js: String, name: String): String = {
    val m = (""""""" + name + """"\s*:\s*("((?:[^"\\]|\\.)*)"|\d+)""").r
      .findFirstMatchIn(js)
      .getOrElse(sys.error(s"MANIFEST.json: missing field $name"))
    if (m.group(2) != null) unesc(m.group(2)) else m.group(1)
  }

  /** Read a manifest without touching the data — callers that only
    * need provenance (kind, rows) skip the verification scan.
    */
  def readManifest(dir: Path): Manifest = {
    val js = new String(
      Files.readAllBytes(dir.resolve("MANIFEST.json")), "UTF-8")
    Manifest(field(js, "kind"), field(js, "rows").toLong,
      field(js, "fingerprint"), field(js, "schema"))
  }

  /** Load a stored model: schema, row count, and content fingerprint
    * must all match the manifest (one model-sized scan), and the
    * returned frame is localCheckpoint-pinned — the same physical
    * posture as an in-session memoized model, ready for the gated
    * joins.
    */
  def load(s: SparkSession, dir: Path): (DataFrame, Manifest) = {
    val m = readManifest(dir)
    val df = s.read.parquet(dir.resolve("data").toString)
    require(df.schema.toDDL == m.schemaDdl,
      s"model table schema drifted: stored '${df.schema.toDDL}' " +
        s"vs manifest '${m.schemaDdl}'")
    val (rows, fp) = fingerprintOf(df)
    require(rows == m.rows && fp == m.fingerprint,
      s"model table content does not match its manifest " +
        s"(rows $rows vs ${m.rows}, fingerprint $fp vs ${m.fingerprint})")
    (df.localCheckpoint(), m)
  }

  // ------------------------------------------------- artifact queries

  /** q_model_artifact_bpe — the shippable-tokenizer round trip: train
    * the BPE merge table, persist it ([[save]]), load it back through
    * manifest verification ([[load]]), and serve the per-language
    * fertility rollup from the LOADED table via [[Bpe.servedCounts]]
    * — the same cap + form gate as the in-session path, with the
    * size-gate row count coming from the manifest instead of a memo.
    * Output carries model_rows so the oracle checks the stored model's
    * cardinality too, not just the served values.
    *
    * 100 TB shape: identical to q_bpe_fertility's (training reads the
    * Heaps-sublinear vocabulary; serving is the size-gated word join +
    * per-lang rollup; text never shuffles) plus one model-sized write
    * + one model-sized verification scan. A production run executes
    * train+save and load+serve in DIFFERENT jobs; ModelStoreSpec pins
    * exactly that split across a session boundary.
    */
  val qModelArtifactBpe = Q(
    "q_model_artifact_bpe",
    (s, d) => {
      import s.implicits._
      val merges = Bpe.train(s, d)
      val dir = graft.Scratch.dir("model_artifact_bpe")
      save(merges.toDF("step", "a", "b", "merged", "cnt"), dir,
        "bpe-merges")
      val (loaded, man) = load(s, dir)
      val wp = Bpe.servedCounts(s, Wordpiece.wordsDf(s, d), loaded,
        man.rows).localCheckpoint()
      val wpRows = wp.count()
      Distributed.modelJoin(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(TextOps.wsTokens(lower(col("text")))).as("word")),
        wp, wpRows, Seq("word"))
        .groupBy("lang", "doc_id")
        .agg(count(lit(1)).as("d_tok"), sum(col("np")).as("d_sub"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("d_tok")).as("n_tok"),
          sum(col("d_sub")).as("n_subtok"))
        .select(col("lang"), col("n_docs"), col("n_tok"),
          col("n_subtok"),
          expr("CAST((CAST(n_subtok AS DECIMAL(38,0)) * 1000000) div " +
            "n_tok AS BIGINT)").as("fertility_ppm"),
          lit(man.rows).as("model_rows"))
        .orderBy("lang")
    },
    Some {
      val applied = Bpe.oracleAppliedExpr("e")
      val mergeUnion = (1 to Bpe.kSteps).map(k => s"SELECT * FROM m$k")
        .mkString(" UNION ALL ")
      s"""WITH ${Bpe.oracleTrainCtes},
         |docs AS (
         |  SELECT lang, CAST(len(t) AS BIGINT) AS n_tok,
         |    array_to_string(list_transform(t,
         |      x -> regexp_replace(x, '(.)', chr(1) || '\\1' || chr(2), 'g')),
         |      chr(3)) AS e
         |  FROM (SELECT lang, list_filter(
         |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
         |    FROM documents)
         |  WHERE len(t) > 0),
         |enc AS (
         |  SELECT lang, n_tok,
         |    CAST(len(me) - len(replace(me, chr(1), '')) AS BIGINT)
         |      AS n_subtok
         |  FROM (SELECT lang, n_tok, $applied AS me FROM docs))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
         |  CAST(sum(n_subtok) AS BIGINT) AS n_subtok,
         |  CAST((CAST(sum(n_subtok) AS HUGEINT) * 1000000)
         |    // CAST(sum(n_tok) AS HUGEINT) AS BIGINT) AS fertility_ppm,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ($mergeUnion))
         |    AS model_rows
         |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
    }
  )

  /** q_model_artifact_nb — the shippable-classifier round trip: train
    * the NB weight table, persist, load through manifest verification,
    * and score the corpus from the LOADED weights
    * ([[Classifier.scoredDocsWith]] — the same size-gated token join
    * as q_nb_score), rolled up per source with the stored model's
    * cardinality alongside.
    *
    * 100 TB shape: q_nb_score's (one vocabulary-keyed gated join, one
    * doc-keyed partial rollup, one ≤ #sources rollup; text never
    * shuffles) plus the model-sized write + verification scan.
    */
  val qModelArtifactNb = Q(
    "q_model_artifact_nb",
    (s, d) => {
      val (model, _) = Classifier.nbModelWithRows(s, d)
      val dir = graft.Scratch.dir("model_artifact_nb")
      save(model, dir, "nb-model")
      val (loaded, man) = load(s, dir)
      Classifier.scoredDocsWith(s, d, loaded, man.rows)
        .crossJoin(broadcast(Classifier.priorsDf(s, d)))
        .select(col("source"),
          (col("score_ppm") + col("prior_ppm")).as("total_ppm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("total_ppm") > 0, 1L).otherwise(0L))
            .as("n_pred_pos"),
          sum(col("total_ppm").cast("decimal(38,0)")).as("sum_margin"))
        .select(col("source"), col("n_docs"), col("n_pred_pos"),
          expr("CAST(sum_margin div n_docs AS BIGINT)")
            .as("mean_margin_ppm"),
          lit(man.rows).as("model_rows"))
        .orderBy("source")
    },
    Some(
      s"""WITH ${Classifier.oracleModelCtes()},
         |${Classifier.oraclePriorCte},
         |${Classifier.oracleScoredCte},
         |scored AS (
         |  SELECT doc_id, source,
         |    score_ppm + (SELECT prior_ppm FROM prior) AS total_ppm
         |  FROM scored0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN total_ppm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pred_pos,
         |  CAST(CAST(sum(total_ppm) AS HUGEINT) // count(*) AS BIGINT)
         |    AS mean_margin_ppm,
         |  (SELECT CAST(count(*) AS BIGINT) FROM model) AS model_rows
         |FROM scored GROUP BY source ORDER BY source""".stripMargin
    )
  )

  /** q_model_artifact_kmeans — the shippable-quantizer round trip:
    * persist the trained k-means centroid table (the coarse quantizer
    * behind IVF search, SemDeDup, and the cluster mixture), load it
    * through manifest verification, and assign the corpus to the
    * LOADED centroids ([[Similarity.assignToCentroids]] — the exact
    * assignment pass the in-session consumers share), rolled up per
    * cluster.
    *
    * 100 TB shape: assignment is one broadcast of the O(k·dims)
    * centroid table over the quantized corpus scan + one vec-keyed
    * aggregate; the store adds a model-sized write + verification
    * scan. This is the artifact an incremental pipeline loads to
    * assign each INCOMING batch without touching the training corpus
    * (q_semdedup_incr serves from the same trained quantizer).
    */
  val qModelArtifactKmeans = Q(
    "q_model_artifact_kmeans",
    (s, d) => {
      val cent = Similarity.trainKmeans(s, d)
      val dir = graft.Scratch.dir("model_artifact_kmeans")
      save(cent, dir, "kmeans-centroids")
      val (loaded, man) = load(s, dir)
      val (v, nv) = Similarity.quantized(s, d)
      Similarity.assignToCentroids(v, nv, loaded)
        .groupBy("cid")
        .agg(count(lit(1)).as("n_vecs"))
        .select(col("cid"), col("n_vecs"),
          lit(man.rows).as("model_rows"))
        .orderBy("cid")
    },
    Some(
      s"""${Similarity.kmeansCtes}
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c2) AS model_rows
         |FROM assign2 GROUP BY cid ORDER BY cid""".stripMargin
    )
  )

  /** q_model_artifact_wordpiece — the WordPiece vocabulary round
    * trip: persist the trained piece set (the DISTINCT merge products
    * — what a shipped tokenizer vocabulary IS), load through manifest
    * verification, and re-serve q_wordpiece_encode's per-doc MaxMatch
    * rollup from the LOADED table via [[Wordpiece.servedCounts]] —
    * same form gate ([[Wordpiece.LiteralFormMaxPieces]]): literal
    * walk under it (gate-bounded collect), the vocabulary-as-table
    * MaxMatch pipeline above it, storage → join build side.
    *
    * 100 TB shape: q_wordpiece_encode's (MaxMatch over Heaps-sublinear
    * distinct words, size-gated word join, doc-keyed partial rollup)
    * plus one model-sized write + verification scan.
    */
  val qModelArtifactWordpiece = Q(
    "q_model_artifact_wordpiece",
    (s, d) => {
      import s.implicits._
      val pieceSet = Wordpiece.train(s, d).map(_._4).distinct
      val dir = graft.Scratch.dir("model_artifact_wordpiece")
      save(pieceSet.toDF("piece"), dir, "wordpiece-vocab")
      val (loaded, man) = load(s, dir)
      val wp = Wordpiece.servedCounts(s, Wordpiece.wordsDf(s, d),
        loaded, man.rows).localCheckpoint()
      val wpRows = wp.count()
      Distributed.modelJoin(
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextOps.wsTokens(lower(col("text")))).as("word")),
        wp, wpRows, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tok"),
          sum(col("np")).as("n_subtok"))
        .select(col("doc_id"), col("n_tok"), col("n_subtok"),
          expr("CAST((CAST(n_subtok AS DECIMAL(38,0)) * 1000000) " +
            "div n_tok AS BIGINT)").as("fertility_ppm"),
          lit(man.rows).as("model_rows"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE
         |${Wordpiece.oracleTrainCtes()},
         |${Wordpiece.oracleEncodeCtes()},
         |toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(
         |    lower(text), '\\s+'), t -> t <> '')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
         |  CAST(sum(np) AS BIGINT) AS n_subtok,
         |  CAST((CAST(sum(np) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
         |    AS fertility_ppm,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pieces) AS model_rows
         |FROM toks JOIN wp USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  /** q_model_artifact_unigram — the unigram-LM cost-table round trip:
    * persist the shipped (piece, cost_ppm) model, load through
    * manifest verification, and re-serve q_unigram_encode's per-doc
    * Viterbi rollup from the LOADED table via
    * [[Unigram.servedCounts]] — same form gate: literal Viterbi under
    * it, the cost-model-as-table DP ([[Unigram.tableFormCountsDf]])
    * above it.
    *
    * 100 TB shape: q_unigram_encode's (Viterbi over Heaps-sublinear
    * distinct words, size-gated word join, doc-keyed partial rollup)
    * plus one model-sized write + verification scan.
    */
  val qModelArtifactUnigram = Q(
    "q_model_artifact_unigram",
    (s, d) => {
      import s.implicits._
      val costs = Unigram.train(s, d).costs
      val dir = graft.Scratch.dir("model_artifact_unigram")
      save(costs.toSeq.sortBy(_._1).toDF("piece", "cost_ppm"), dir,
        "unigram-costs")
      val (loaded, man) = load(s, dir)
      val wp = Unigram.servedCounts(s, Unigram.wordsDf(s, d),
        loaded, man.rows).localCheckpoint()
      val wpRows = wp.count()
      Distributed.modelJoin(
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextOps.wsTokens(lower(col("text")))).as("word")),
        wp, wpRows, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tok"),
          sum(col("np")).as("n_subtok"))
        .select(col("doc_id"), col("n_tok"), col("n_subtok"),
          expr("CAST((CAST(n_subtok AS DECIMAL(38,0)) * 1000000) " +
            "div n_tok AS BIGINT)").as("fertility_ppm"),
          lit(man.rows).as("model_rows"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE
         |${Unigram.oracleTrainCtes()},
         |${Unigram.costSql("cf", "n3")},
         |${Unigram.segRoundSql(4, "cf")},
         |wp AS (SELECT word, CAST(len(pieces) AS BIGINT) AS np FROM seg4),
         |toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(
         |    lower(text), '\\s+'), t -> t <> '')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
         |  CAST(sum(np) AS BIGINT) AS n_subtok,
         |  CAST((CAST(sum(np) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
         |    AS fertility_ppm,
         |  (SELECT CAST(count(*) AS BIGINT) FROM n3) AS model_rows
         |FROM toks JOIN wp USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  /** q_model_artifact_pq — the PQ codebook round trip: persist the
    * trained product-quantization codebook (cid, pos, cq — m×k
    * subspace centroids, the artifact a vector index ships), load
    * through manifest verification, and RE-ENCODE the corpus from the
    * LOADED codebook ([[Similarity.pqEncode]] — the exact
    * nearest-centroid assignment the in-session index build runs),
    * rolled up as the per-(subspace, code) population histogram.
    *
    * 100 TB shape: the codebook is an O(m·k·dims) broadcast; encoding
    * is one broadcast join over the quantized corpus scan + a
    * (vec, sub)-keyed argmin — the same shape that encodes an
    * INCOMING batch against a shipped index without touching the
    * training corpus.
    */
  val qModelArtifactPq = Q(
    "q_model_artifact_pq",
    (s, d) => {
      val (c1, _) = Similarity.pqTrain(s, d)
      val dir = graft.Scratch.dir("model_artifact_pq")
      save(c1, dir, "pq-codebook")
      val (loaded, man) = load(s, dir)
      Similarity.pqEncode(s, d, loaded)
        .groupBy("sub", "code")
        .agg(count(lit(1)).as("n_vecs"))
        .select(col("sub"), col("code"), col("n_vecs"),
          lit(man.rows).as("model_rows"))
        .orderBy("sub", "code")
    },
    Some(
      s"""${Similarity.pqOracleCtes}
         |SELECT sub, code, CAST(count(*) AS BIGINT) AS n_vecs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM c1) AS model_rows
         |FROM codes GROUP BY sub, code ORDER BY sub, code""".stripMargin
    )
  )

  val all: Seq[Q] =
    Seq(qModelArtifactBpe, qModelArtifactNb, qModelArtifactKmeans,
      qModelArtifactWordpiece, qModelArtifactUnigram, qModelArtifactPq)
}
