"""Sources & sinks: synthetic transcripts, table IO, lineage/resume."""
