package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production-vocabulary-scale MaxMatch encoding — the shape proof the
  * trained-tokenizer encode paths defer ([[Wordpiece]]/[[Unigram]]
  * round-10 verdict #1): every trained model there rides the plan as a
  * `typedlit` map literal, correct and fast at the shipped toy sizes
  * (≤ ~60 pieces) but the wrong shape at a real 32k–256k-piece
  * vocabulary — literal-map `element_at` is a linear scan per lookup
  * and the model ships in every task closure instead of entering the
  * plan as data. This rung runs the SAME greedy longest-match-first
  * encoder with the vocabulary held as a TABLE:
  *
  *   1. substring-explode the 2..L-length candidates of each distinct
  *      word (one row per (word, pos, len)),
  *   2. join the vocabulary through the size gate
  *      ([[Distributed.modelJoin]] — broadcast at 4k pieces, a
  *      piece-keyed shuffle join at web-corpus vocabulary sizes),
  *   3. reduce to the greedy best match per (word, pos) — max len,
  *      exactly MaxMatch's longest-first rule,
  *   4. reassemble per word: collect the bounded (pos → best-len) map
  *      (≤ word-length entries) and walk it with a codegen-planned
  *      higher-order `aggregate` — each step jumps by the matched
  *      length, or 1 (single chars are the implicit fallback rung of
  *      the vocabulary, so segmentation is total by construction and
  *      no [UNK] branch is needed).
  *
  * No `typedlit` appears anywhere: the vocabulary enters the plan as a
  * scanned relation, so a 256k-piece (or 10⁸-piece) vocabulary changes
  * the join's build side, never the task closure. Swapping a TRAINED
  * 32k WordPiece vocabulary into this pipeline is a one-line change of
  * the vocab frame; the plan shape is identical.
  *
  * The word population: the fixture corpus's natural vocabulary is 31
  * distinct words (deliberately tiny synthetic text), which cannot
  * exercise a 4k-piece vocabulary — so the rung derives a scaled word
  * population DETERMINISTICALLY from the corpus: 4 salted content
  * digests per document (md5(k || '|' || text), k < 4, 32-char hex
  * words over a 16-char alphabet). The planted-fixture precedent
  * (q_secret_redact); both engines derive bit-identical words, the
  * distinct-word frame grows linearly with the corpus (the
  * Heaps-regime the encoder must survive), and the resulting
  * vocabulary is EXACTLY [[VocabK]] pieces ranked by exact weighted
  * substring counts with a (count DESC, piece ASC) total order.
  *
  * 100 TB shape: candidates explode ≤ 31·(L−1) rows per DISTINCT word
  * (never per document); the vocab join is the gated model join; best
  * match and map reassembly partial-aggregate on (word, pos) / word;
  * the doc-side pass is the usual tokenize → gated word join →
  * doc-keyed rollup. Document text never shuffles; the only
  * vocabulary-sized artifacts are the vocab table and the per-word
  * piece counts, both memoized per (session, dataset).
  */
object WordpieceXl {

  /** Longest candidate piece length. */
  private val Lmax = 8

  /** Vocabulary budget (multi-char pieces; single chars are the
    * implicit fallback and never need a table row).
    */
  private[graft] val VocabK = 4096

  /** Salted digest words per document. */
  private val WordsPerDoc = 4

  /** (doc_id, word): the derived scaled word population — 4 salted
    * 32-hex-char digest words per document.
    */
  private def docWords(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      explode(array((0 until WordsPerDoc).map(k =>
        md5(concat(lit(s"$k|"), col("text")))): _*)).as("word"))

  /** Distinct derived words with corpus frequency — the frame every
    * vocabulary-side stage operates on.
    */
  private def xlWordsDf(s: SparkSession, d: String): DataFrame =
    docWords(s, d).groupBy("word").agg(count(lit(1)).as("freq"))

  /** All (word, pos, len, piece) substring candidates of 2..lmax
    * chars. The Spark `sequence(2, 1)` pitfall (it infers step −1 and
    * returns [2,1]) is guarded: positions with < 2 remaining chars
    * emit an empty candidate array.
    */
  private[ops] def candidates(words: DataFrame, lmax: Int = Lmax)
      : DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        explode(when(length(col("word")) - col("pos") + 1 >= 2,
          sequence(lit(2),
            least(lit(lmax), length(col("word")) - col("pos") + 1)))
          .otherwise(array().cast("array<int>"))).as("l"))
      .select(col("word"), col("freq"), col("pos"), col("l"),
        col("word").substr(col("pos"), col("l")).as("piece"))

  /** The vocabulary TABLE: top-[[VocabK]] multi-char pieces by exact
    * weighted occurrence count, (cnt DESC, piece ASC) total order —
    * memoized with its row count for the match join's size gate.
    */
  private[graft] def xlVocabWithRows(s: SparkSession, d: String)
      : (DataFrame, Long) =
    Similarity.memo(s, d, "wordpiece-xl-vocab") {
      val v = candidates(xlWordsDf(s, d))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(VocabK)
        .select("piece")
        .localCheckpoint()
      (v, v.count())
    }

  /** The match stage — candidates joined to the vocabulary TABLE
    * through the size gate. Package-private so the spec can assert
    * the vocabulary enters this plan as a scanned relation (a join
    * build side), not a literal.
    */
  private[graft] def xlMatches(s: SparkSession, d: String): DataFrame = {
    val (vocab, vRows) = xlVocabWithRows(s, d)
    Distributed.modelJoin(
      candidates(xlWordsDf(s, d)).select("word", "pos", "l", "piece"),
      vocab, vRows, Seq("piece"))
  }

  /** Greedy MaxMatch walk over the per-word (pos → best-len) map:
    * start at pos 1, jump by the longest match (or 1), count pieces.
    * `m` is a DATA column (map_from_entries over the bounded per-word
    * match list), never a literal.
    */
  private def greedyWalk(w: Column, m: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("pos"), lit(0L).as("np")),
      (acc, _) =>
        when(acc("pos") <= length(w),
          struct(
            (acc("pos") + coalesce(element_at(m, acc("pos")), lit(1)))
              .as("pos"),
            (acc("np") + 1L).as("np")))
          .otherwise(acc),
      acc => acc("np"))

  /** The generic table-form MaxMatch: per-distinct-word greedy piece
    * counts of `words` (word, freq) under `vocab` (piece) held as
    * data — candidates → gated vocab join → greedy best per (word,
    * pos) → bounded map walk. Shared by the XL rung and
    * [[Wordpiece]]'s form-gated trained encoder (the ≥ threshold
    * arm).
    */
  private[ops] def maxMatchCounts(words: DataFrame, vocab: DataFrame,
      vocabRows: Long, lmax: Int): DataFrame = {
    val best = Distributed.modelJoin(
      candidates(words, lmax).select("word", "pos", "l", "piece"),
      vocab, vocabRows, Seq("piece"))
      .groupBy("word", "pos").agg(max(col("l")).as("bl"))
    val wmap = best.groupBy("word")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("bl"))))
        .as("m"))
    words.select("word")
      .join(wmap, Seq("word"), "left")
      .select(col("word"), greedyWalk(col("word"), col("m")).as("np"))
  }

  /** Per-distinct-word MaxMatch piece counts under the table-held
    * vocabulary, memoized with rows for the doc-side join's gate.
    */
  private[graft] def xlWordPieceCountsWithRows(s: SparkSession, d: String)
      : (DataFrame, Long) =
    Similarity.memo(s, d, "wordpiece-xl-wpc") {
      val (vocab, vRows) = xlVocabWithRows(s, d)
      val wp = maxMatchCounts(xlWordsDf(s, d), vocab, vRows, Lmax)
        .localCheckpoint()
      (wp, wp.count())
    }

  /** q_wordpiece_encode_xl — per-document piece counts and exact
    * fertility under the 4096-piece table-held vocabulary: the
    * production-shape sibling of [[Wordpiece.qWordpieceEncode]] (same
    * output schema, same MaxMatch semantics, vocabulary as DATA).
    */
  val qWordpieceEncodeXl = Q(
    "q_wordpiece_encode_xl",
    (s, d) => {
      val (wp, wpRows) = xlWordPieceCountsWithRows(s, d)
      Distributed.modelJoin(docWords(s, d), wp, wpRows, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tok"),
          sum(col("np")).as("n_subtok"))
        .select(col("doc_id"), col("n_tok"), col("n_subtok"),
          expr("CAST((CAST(n_subtok AS DECIMAL(38,0)) * 1000000) " +
            "div n_tok AS BIGINT)").as("fertility_ppm"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE
         |xdw AS MATERIALIZED (
         |  SELECT doc_id, md5(CAST(k AS VARCHAR) || '|' || text) AS word
         |  FROM documents, UNNEST([0, 1, 2, 3]) AS u(k)),
         |xwords AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq
         |  FROM xdw GROUP BY 1),
         |xcand AS (
         |  SELECT word, freq, i AS pos, l,
         |    substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
         |  FROM xwords,
         |    UNNEST(range(1, len(word) + 1)) AS u(i),
         |    UNNEST(range(2, least($Lmax, len(word) - i + 1) + 1)) AS v(l)),
         |xvocab AS MATERIALIZED (
         |  SELECT piece FROM (
         |    SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
         |    FROM xcand GROUP BY 1)
         |  ORDER BY cnt DESC, piece ASC LIMIT $VocabK),
         |xmatch AS (
         |  SELECT word, pos, max(l) AS bl
         |  FROM xcand JOIN xvocab USING (piece)
         |  GROUP BY word, pos),
         |xmap AS MATERIALIZED (
         |  SELECT word, map(list(pos ORDER BY pos), list(bl ORDER BY pos))
         |    AS m
         |  FROM xmatch GROUP BY word),
         |xwalk AS (
         |  SELECT w.word, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np,
         |    m.m AS m
         |  FROM xwords w LEFT JOIN xmap m USING (word)
         |  UNION ALL
         |  SELECT word, pos + coalesce(map_extract(m, pos)[1], 1), np + 1, m
         |  FROM xwalk WHERE pos <= len(word)),
         |xwp AS MATERIALIZED (
         |  SELECT word, np FROM xwalk WHERE pos = len(word) + 1)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
         |  CAST(sum(np) AS BIGINT) AS n_subtok,
         |  CAST((CAST(sum(np) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
         |    AS fertility_ppm
         |FROM xdw JOIN xwp USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(qWordpieceEncodeXl)
}
