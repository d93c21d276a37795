package graft.queries

/** Placeholders — filled in by the LLM-pipeline milestones (SURVEY §2.6). */
object TextQueries { val defs: Seq[QueryDef] = Seq.empty }
object DedupQueries { val defs: Seq[QueryDef] = Seq.empty }
object SimilarityQueries { val defs: Seq[QueryDef] = Seq.empty }
object MultimodalQueries { val defs: Seq[QueryDef] = Seq.empty }
