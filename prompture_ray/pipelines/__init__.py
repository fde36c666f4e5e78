"""End-to-end pipelines: suite runs, reports, benchmarks."""
