"""Multi-step logical plans: managed tables, MERGE upsert, schema evolution."""
