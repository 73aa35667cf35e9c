"""Sources & sinks: batch and streaming readers/writers (SURVEY §2.1/§2.2)."""
