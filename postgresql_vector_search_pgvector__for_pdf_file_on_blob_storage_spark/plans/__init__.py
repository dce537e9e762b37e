"""Plan-inspection helpers: assert pushdown/broadcast/codegen properties of
physical plans (used by tests and tuning)."""
