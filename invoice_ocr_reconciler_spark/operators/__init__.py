from .reconcile import reconcile, candidate_pairs, RESULT_SCHEMA

__all__ = ["reconcile", "candidate_pairs", "RESULT_SCHEMA"]
