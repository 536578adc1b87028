package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.sinks.Sinks

/** The `riemann test` workflow (reference src/riemann/test.clj:33-153,
  * driven by `riemann test config`, bin.clj:102-122): users mark
  * observation points inside their real topology with `tap`, wrap
  * side-effecting sinks in `io`, then `inject!` test events through the
  * whole config and assert on what each tap captured.
  *
  * Spark reading: a topology is a function of the input relation; taps
  * name intermediate DataFrames. In test mode every tap's plan is
  * captured (and collected on `inject`), and `io`-wrapped sinks become
  * no-ops (the reference's `bit-bucket` compile-away); in production
  * mode `tap` is identity and `io` runs the real sink — same config
  * text, zero test overhead in prod, exactly the reference's
  * `*testing*` compile-time switch.
  */
class Testkit(val testing: Boolean) {

  private val taps = mutable.LinkedHashMap[String, DataFrame]()
  private val defined = mutable.Map[String, String]()

  /** `tap name` (test.clj:46-81): record the stream at this point under
    * a globally unique name, pass it through unchanged. Duplicate tap
    * names throw, like the reference's compile-time check. */
  def tap(name: String, df: DataFrame): DataFrame = {
    if (testing) {
      defined.get(name).foreach { at =>
        throw new IllegalStateException(
          s"Tap $name already defined at $at")
      }
      defined(name) = Thread.currentThread.getStackTrace
        .drop(2).headOption.map(_.toString).getOrElse("?")
      taps(name) = df
    }
    df
  }

  /** `io` (test.clj:82-95): run the sink only outside test mode; in
    * test mode the events fall into the bit-bucket. */
  def io(df: DataFrame, sink: Sinks.EventSink, batchId: Long = 0L): Unit =
    if (!testing) sink.write(df, batchId)

  /** `inject!`/`run-test!` (test.clj:120-153): build the topology over
    * the test input, then collect every tap's capture. Returns
    * tap name → captured rows (in the tap plan's own order). */
  def inject(input: DataFrame)(build: DataFrame => Unit)
      : Map[String, Seq[org.apache.spark.sql.Row]] = {
    taps.clear(); defined.clear()
    build(input)
    taps.map { case (name, df) => name -> df.collect().toSeq }.toMap
  }
}

object Testkit {
  /** Test-mode kit — taps capture, io suppresses. */
  def test: Testkit = new Testkit(true)
  /** Production mode — taps vanish, io runs (test.clj's *testing* false
    * branch: `tap` compiles to sdo, `io` to the real children). */
  def prod: Testkit = new Testkit(false)
}
