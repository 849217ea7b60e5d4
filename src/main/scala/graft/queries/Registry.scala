package graft.queries

/** All engine capabilities, each a [[QueryDef]]. Sections are appended as
  * they land: relational parity (SURVEY.md §2.B), event/stream semantics,
  * the NATS source E2E (§2.A), and LLM-pipeline extensions (§7.5).
  */
object Registry {
  val all: Seq[QueryDef] =
    Relational.defs ++ Streaming.defs ++ Pipeline.defs ++ PipelineDedup.defs ++
      PipelineRetrieval.defs ++ PipelineTokenizer.defs ++ Analytics.defs ++
      Unigram.defs ++ Curation.defs

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
