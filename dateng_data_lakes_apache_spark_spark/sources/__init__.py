"""Lake sources & sinks: schema-applied readers and partitioned writers."""
