"""Ray Data stages: decode (S1-S3), segment (A2/A3), recognize (A1),
assemble (G3/G4). Each stage is a batch transform over Arrow batches;
recognize is a callable class intended for `map_batches(..., concurrency=N)`
actor pools (SURVEY.md §2.4)."""
