package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WordpieceXl

/** Production-vocabulary MaxMatch rung: vocabulary budget/shape pins,
  * an INDEPENDENT Scala reimplementation of the greedy walk checked
  * against the pipeline's counts, and the vocab-as-data plan
  * assertions (round-10 verdict #1: the vocabulary must enter the
  * plan as a scanned relation, never a typedlit literal).
  */
class WordpieceXlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("wordpiece-xl-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  test("the vocabulary is EXACTLY the 4096-piece budget with the " +
    "(cnt DESC, piece ASC) total order filling 2-grams first") {
    val (vocab, rows) = WordpieceXl.xlVocabWithRows(spark, sf)
    assert(rows === WordpieceXl.VocabK.toLong)
    val pieces = vocab.collect().map(_.getString(0))
    assert(pieces.length === WordpieceXl.VocabK)
    assert(pieces.toSet.size === WordpieceXl.VocabK, "pieces are distinct")
    // hex digest words: all 256 2-grams occur far more often than any
    // 3-gram, so the budget admits every 2-gram and fills the rest
    // with 3-grams
    val byLen = pieces.groupBy(_.length).view.mapValues(_.length).toMap
    assert(byLen(2) === 256)
    assert(byLen(3) === WordpieceXl.VocabK - 256)
  }

  test("greedy MaxMatch counts match an independent Scala " +
    "reimplementation over the same vocabulary") {
    val vocab = WordpieceXl.xlVocabWithRows(spark, sf)._1
      .collect().map(_.getString(0)).toSet
    def greedyRef(w: String): Long = {
      var pos = 0; var np = 0L
      while (pos < w.length) {
        var l = math.min(8, w.length - pos)
        while (l >= 2 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
        pos += math.max(l, 1); np += 1
      }
      np
    }
    val wp = WordpieceXl.xlWordPieceCountsWithRows(spark, sf)._1
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(wp.length >= 1000, "the derived word population is scaled")
    wp.foreach { case (w, np) =>
      assert(np === greedyRef(w), s"greedy mismatch on $w")
    }
  }

  test("the vocabulary enters the plan as DATA (a join build side), " +
    "never a typedlit literal") {
    val pMatch = WordpieceXl.xlMatches(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pMatch.contains("BroadcastHashJoin"),
      s"4k vocab rides the gate's broadcast arm:\n${pMatch.take(1500)}")
    assert(!pMatch.contains("element_at(map("),
      "no literal-map lookup in the match stage")
    val pQuery = SparkEntry.queries("q_wordpiece_encode_xl")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pQuery.contains("BroadcastHashJoin"),
      s"doc-side piece counts join as data:\n${pQuery.take(1500)}")
    assert(!pQuery.contains("element_at(map("),
      "no literal-map lookup anywhere in the encode plan")
  }

  test("form gate: the table arm computes EXACTLY the literal arm's " +
    "MaxMatch counts on the trained vocabulary, with no literal in " +
    "its plan") {
    import graft.ops.Wordpiece
    val pieceSet = Wordpiece.train(spark, sf).map(_._4).distinct
    assert(pieceSet.nonEmpty &&
      pieceSet.size <= Wordpiece.LiteralFormMaxPieces,
      "the shipped trained vocab is toy-sized — the literal arm serves it")
    val words = Wordpiece.wordsDf(spark, sf).localCheckpoint()
    val lit = Wordpiece.literalFormCounts(words, pieceSet)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tab = Wordpiece.tableFormCounts(spark, words, pieceSet)
    val pTab = tab.queryExecution.executedPlan.toString
    assert(!pTab.contains("element_at(map("),
      "the table arm must not carry the vocabulary as a literal")
    val tabM = tab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tabM === lit, "both physical forms are the same encoder")
  }

  test("unigram form gate: the table-form Viterbi equals the literal " +
    "form bit for bit (same DP, same tie-breaks), no literal in its " +
    "plan") {
    import graft.ops.Unigram
    val costs = Unigram.train(spark, sf).costs
    assert(costs.nonEmpty)
    val words = Unigram.wordsDf(spark, sf)
    val lit = Unigram.literalFormCounts(words, costs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tab = Unigram.tableFormCounts(spark, words, costs)
    val pTab = tab.queryExecution.executedPlan.toString
    assert(!pTab.contains("element_at(map("),
      "the table arm must not carry the cost model as a literal")
    val tabM = tab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tabM === lit, "both physical forms are the same segmenter")
  }

  test("every document encodes: 4 derived words each, subtoken count " +
    "bounded by [len/3, len] per word") {
    val rows = SparkEntry.queries("q_wordpiece_encode_xl")(spark, sf)
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getInt(1) === 4)
      val subtok = r.getLong(2)
      // 4 words x 32 hex chars: >= ceil(32/3)=11 pieces per word (max
      // piece observed is 3 chars), <= 32 (all singles)
      assert(subtok >= 44L && subtok <= 128L, s"n_subtok $subtok")
    }
  }
}
