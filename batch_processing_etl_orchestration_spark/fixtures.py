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
