package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classifier

/** Naive-Bayes classifier family: hand-computed model weights on a
  * tiny corpus, the routing decision, and the shared-model memo.
  */
class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("classifier-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Tiny corpus with hand-checkable counts: 'good' appears only in
    * the curated source, 'spam' only outside it, 'the' everywhere
    * symmetrically.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("nbspec").toString
    import spark.implicits._
    Seq(
      (0L, "good the good", "en", "src0", 13L),
      (1L, "good the", "en", "src0", 8L),
      (2L, "spam the spam", "en", "src1", 13L),
      (3L, "spam the", "en", "src2", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  override def beforeAll(): Unit = spark.sparkContext.setLogLevel("WARN")
  override def afterAll(): Unit = spark.stop()

  private def lnPpm(x: Double): Long =
    math.floor(math.log(x) * 1e6 + 0.5).toLong

  test("q_nb_train computes the hand-derived Laplace-smoothed llr") {
    // counts: good (3+,0-), spam (0+,3-), the (2+,2-); N+=5, N-=5, V=3
    val rows = SparkEntry.queries("q_nb_train")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def llr(cp: Long, cn: Long): Long =
      lnPpm((cp + 1).toDouble / 8) - lnPpm((cn + 1).toDouble / 8)
    assert(rows("good") === ((3L, 0L, llr(3, 0))))
    assert(rows("spam") === ((0L, 3L, llr(0, 3))))
    assert(rows("the") === ((2L, 2L, 0L)))
    assert(rows("good")._3 > 0 && rows("spam")._3 < 0)
  }

  test("q_nb_score routes the curated docs positive, the rest negative") {
    val rows = SparkEntry.queries("q_nb_score")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // prior is 0 (2 docs each side); 'the' contributes 0, so the sign
    // is carried entirely by the class-exclusive tokens
    assert(rows("src0")._1 === 2L)
    assert(rows("src0")._2 === 2L) // both curated docs predicted positive
    assert(rows("src0")._3 > 0L)
    assert(rows("src1") === ((1L, 0L, rows("src1")._3)))
    assert(rows("src1")._3 < 0L && rows("src2")._3 < 0L)
    // doc 2 has two 'spam' + one 'the', doc 3 one 'spam' + one 'the':
    // margins are exactly -2*|llr(spam)| and -|llr(spam)|
    val spamLlr = lnPpm(1.0 / 8) - lnPpm(4.0 / 8)
    assert(rows("src1")._3 === 2 * spamLlr)
    assert(rows("src2")._3 === spamLlr)
  }

  test("q_nb_auc is exactly 1.0 on the perfectly separable corpus") {
    // positives score +llr(good)·{2,1}, negatives +llr(spam)·{2,1}
    // with llr(good) > 0 > llr(spam): perfect ranking, AUC = 1
    val r = SparkEntry.queries("q_nb_auc")(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 2L && r(0).getLong(1) === 2L)
    assert(r(0).getLong(2) === 1000000L)
  }

  test("q_nb_thresholds: hand-computed rungs on the separable corpus " +
    "and sweep monotonicity") {
    // prior = 0 (2 docs/side); margins: +2g, +g, -g, -2g with
    // g = lnppm(1/2) - lnppm(1/8) = 1386295
    val rows = SparkEntry.queries("q_nb_thresholds")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // t = -1.5e6 keeps {+2g, +g, -g}: precision 2/3, recall 1, F1 4/5
    assert(rows(-1500000L) === ((3L, 2L, 666666L, 1000000L, 800000L)))
    // t = -3e6 keeps all 4: precision 1/2, recall 1, F1 2/3
    assert(rows(-3000000L) === ((4L, 2L, 500000L, 1000000L, 666666L)))
    // kept and recall are non-increasing as the threshold tightens
    val byT = rows.toSeq.sortBy(_._1)
    byT.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b._1 <= a._1 && b._4 <= a._4)
    }
  }

  test("train and score share ONE model build per (session, dataset)") {
    val before = Classifier.nbModelBuilds.get()
    SparkEntry.queries("q_nb_train")(spark, dir).collect()
    SparkEntry.queries("q_nb_score")(spark, dir).collect()
    SparkEntry.queries("q_nb_score")(spark, dir).collect()
    // dir was already touched by the earlier tests' memo — zero new
    // builds here; a fresh dataset dir costs exactly one
    assert(Classifier.nbModelBuilds.get() === before)
  }
}
