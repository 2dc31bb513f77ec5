"""Plan-inspection helpers (pushdown / broadcast / codegen asserts)."""
