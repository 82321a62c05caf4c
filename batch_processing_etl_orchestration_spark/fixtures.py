"""Deterministic adversarial-shape constants (VERDICT r8 next #2 /
r9 next #6), shared by the fixture generator
(tools/make_adversarial.py), the registered attestation query
(plans/northstar.q_adversarial_skew_report), and the scale tests
(tests/test_adversarial.py) — one definition, so the driver-hashed
numbers and the on-disk fixture can never drift apart.

The two shapes the sf1 replica construction cannot express:
- BOILERPLATE: one fixed paragraph appended to BOILER_PCT% of
  documents (doc_id % 100 < BOILER_PCT). Every shingle inside it has
  document frequency BOILER_PCT% · |docs|, the hot-key quadratic mode
  the df-cap bounds.
- HOT ENTITY: events with event_id % HOT_EVENT_MOD == 0 remapped to
  ONE user (MIN(user_id)) — the window-skew shape AQE cannot split,
  countered by operators/sessionize.sessionize_blocked's day blocks.

No RNG anywhere: both shapes are pure functions of ids, so any engine
can reproduce them from the base tables.
"""

ADVERSARIAL_BOILER = (
    "subscribe to our newsletter for weekly updates and exclusive offers "
    "delivered straight to your inbox today"
)
ADVERSARIAL_BOILER_PCT = 30  # doc_id % 100 < PCT gets the paragraph
ADVERSARIAL_HOT_EVENT_MOD = 2  # event_id % MOD == 0 → hot user (50%)

# Selection-family skew shapes (VERDICT r12 #5): one source owning 90%
# of documents (stresses source-keyed grouping in corpus assembly /
# mixing / splits) and a single mega-document of 10⁶ tokens (stresses
# the per-doc explode task and the doc-keyed scoring aggregation).
ADVERSARIAL_HOT_SOURCE_MOD = 10  # doc_id % MOD != 0 → hot source (90%)
ADVERSARIAL_HOT_SOURCE = "src-hot"
ADVERSARIAL_MEGA_PHRASE = "join hash scan the of agg sort merge filter row"
ADVERSARIAL_MEGA_REPEAT = 100_000  # × 10 phrase words = 10⁶ tokens
