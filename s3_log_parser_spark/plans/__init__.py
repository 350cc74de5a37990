"""End-to-end pipeline DAG + lineage/resume."""
