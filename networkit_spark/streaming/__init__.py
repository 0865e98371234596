"""Dynamic-graph event streams + Structured Streaming operators."""
