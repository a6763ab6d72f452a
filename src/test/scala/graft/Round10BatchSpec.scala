package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Round-10 batch: the de-skewed exact-signature survivors rollup
  * (whale-immune groupBy instead of a sig-partitioned window) and the
  * memoized perceptual-signature table (one codec pass per session
  * serving every downstream consumer).
  */
class Round10BatchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("round10-batch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  private var sigBuildsBaseline = 0L

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    sigBuildsBaseline = Multimodal.dhashSigBuilds.get()
  }
  override def afterAll(): Unit = spark.stop()

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // -------------------------------------------- q_media_dhash_survivors

  test("q_media_dhash_survivors plans NO window over the raw signature") {
    // the round-9 weak flag: a sig-partitioned window puts a
    // massively-duplicated asset's whole cluster on one reducer; the
    // rollup form must not plan ANY Window node
    val plan = run("q_media_dhash_survivors").queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      s"survivors must be a groupBy rollup, found windows: $windows")
    // and the partial-aggregated rollup must actually be there
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.references.exists(
            _.name == "sig")) => a
    }
    assert(aggs.nonEmpty, "expected a sig-keyed Aggregate rollup")
  }

  test("survivors rollup matches the window semantics on a frame where " +
    "one signature holds >50% of all rows") {
    import spark.implicits._
    // the whale: signature "W" holds 600 of 1000 rows — exactly the
    // input the op is documented to absorb and a window degenerates on
    val whale = (0 until 600).map(i => (1000L + i, i % 3, "W"))
    val rest  = (0 until 400).map(i => (i.toLong, 0, s"S${i % 37}"))
    val sigs  = (whale ++ rest).toDF("doc_id", "v", "sig")
      .repartition(4)
    val got = Multimodal.sigSurvivors(sigs)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got.size === 1000)
    // driver-side reference: group by sig, min (doc_id, v) keeps
    val bySig = (whale ++ rest).groupBy(_._3)
    for ((sig, rows) <- bySig) {
      val mn = rows.map(t => (t._1, t._2)).min
      for ((id, v, _) <- rows) {
        val (keep, n) = got((id, v))
        assert(n === rows.size.toLong, s"cluster size of $sig")
        assert(keep === ((id, v) == mn), s"keep decision of ($id,$v)")
      }
    }
    // the whale cluster kept exactly one survivor
    assert(got.count { case ((_, _), (k, n)) => n == 600L && k } === 1)
  }

  // ----------------------------------------- memoized signature table

  test("the three signature consumers share ONE codec pass per session") {
    Seq("q_media_dhash_dedup", "q_media_dhash_survivors",
      "q_cluster_safe_split").foreach { q =>
      assert(run(q).collect().nonEmpty, s"$q must produce rows")
    }
    // across the WHOLE suite session (including the plan-shape test
    // above, which also constructs the survivors frame) the codec
    // pass ran exactly once — the memo serves every consumer after
    val built = Multimodal.dhashSigBuilds.get() - sigBuildsBaseline
    assert(built === 1L,
      s"expected exactly one memoized signature build this session, got $built")
  }
}
