"""Source/format adapters that Spark lacks natively in this offline
environment (Avro container files, …)."""
