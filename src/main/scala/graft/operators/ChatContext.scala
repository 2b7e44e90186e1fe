package graft.operators

import org.apache.spark.sql.DataFrame

/** LLM chat-context emitters (SURVEY §2.9 L1-L3): serialize the three
  * profile artifacts — schema, stats, sample documents — into the
  * app-provided context block the reference prepends to LLM prompts
  * (`views/chat_view.py:48-60`, `:859-887`): START/END markers with
  * titled ```json sections, in schema → metadata → samples order.
  * Driver-side rendering over collected (small) results; the engine
  * side is the three DataFrames themselves.
  */
object ChatContext {

  val StartMarker = "--- START APP-PROVIDED CONTEXT ---"
  val EndMarker = "--- END APP-PROVIDED CONTEXT ---"

  private def section(title: String, json: String): String =
    s"$title:\n```json\n$json\n```"

  /** L1: ordered context block. Pass null/empty for absent sections. */
  def contextBlock(schemaJson: String, statsJson: String,
                   sampleDocsJson: String): String = {
    val sections = Seq(
      Option(schemaJson).filter(_.nonEmpty)
        .map(section("Collection Schema", _)),
      Option(statsJson).filter(_.nonEmpty)
        .map(section("Collection Field Statistics", _)),
      Option(sampleDocsJson).filter(_.nonEmpty)
        .map(section("Sample Documents", _))).flatten
    (StartMarker +: sections :+ EndMarker).mkString("\n\n")
  }

  /** Render a small DataFrame as a deterministic JSON array string
    * (row order preserved; drive it with an ordered input).
    */
  def toJsonArray(df: DataFrame): String =
    df.toJSON.collect().mkString("[\n", ",\n", "\n]")

  /** L2 session memo with the reference's invalidation discipline
    * (`tui.py:141-143` `watch_active_collection`): the cached context
    * belongs to the ACTIVE collection only — switching to a different
    * collection drops it immediately (stale context must never leak
    * into a prompt for another collection), re-requesting the same
    * active collection reuses it without recomputing, and switching
    * away and back recomputes (the reference nulls the results on any
    * change, it keeps no multi-collection map). Driver-side state for
    * an interactive session; not thread-shared.
    */
  final class ContextCache {
    private var active: Option[String] = None
    private var block: Option[String] = None

    /** The context for `collection`, computing via `compute` only on
      * a miss (first request or collection switch).
      */
    def get(collection: String)(compute: => String): String = {
      if (!active.contains(collection)) {
        active = Some(collection)
        block = None
      }
      block.getOrElse { val b = compute; block = Some(b); b }
    }

    /** Active-collection switch without a fetch — mirrors the
      * reference resetting `current_schema_analysis_results` the
      * moment the selection changes, before any new analysis runs.
      */
    def setActive(collection: String): Unit =
      if (!active.contains(collection)) {
        active = Some(collection)
        block = None
      }

    def cached: Option[String] = block
  }

  /** L2/L3: full context for one collection — profile (with the chat
    * path's sample_size=100 default, `views/chat_view.py:733`) + newest
    * sample docs (default 3, `views/chat_view.py:60`).
    */
  def collectionContext(df: DataFrame, idCol: String,
                        profileSample: Int = 100,
                        sampleDocs: Int = 3): String = {
    val sampled = df.limit(profileSample)
    val schema = Profiler.flatSchema(sampled).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val hierarchical = Profiler.hierarchicalSchema(schema.toSeq)
    val stats = toJsonArray(Profiler.profileStats(sampled))
    val samples = toJsonArray(Sampling.newestN(df, idCol, sampleDocs))
    contextBlock(hierarchical, stats, samples)
  }
}
