package graft.sources

/** A DML/read entry point found the table EMPTY — Delta: no active
  * files; Iceberg: no current snapshot, or a current snapshot with zero
  * live data files. A dedicated type so the catalog's SQL seam can
  * implement its 0-row-no-op contract (SELECT/DELETE/UPDATE/MERGE over
  * an empty table succeed with nothing to do) by catching exactly this
  * — never by message-substring matching, which a table path containing
  * the phrase would corrupt, and which missed the live-data-files-empty
  * spelling entirely. Subclasses IllegalArgumentException so library
  * callers' existing refusal handling is unchanged. */
class EmptyTableException(msg: String) extends IllegalArgumentException(msg)
