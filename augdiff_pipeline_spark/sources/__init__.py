"""Sources & sinks: snapshot-committed tables, entity state, change
batches, GeoJSON output."""
