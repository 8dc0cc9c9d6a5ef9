"""Document operators: HTML main-content extraction and rule-based field
extraction (the reference fork's IC layer)."""
