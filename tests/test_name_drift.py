"""Registry name-drift audit.

Every declared query's decorated function ``__name__`` must prefix-match its
declared id (``def p17`` ↔ ``"p17_pack_efficiency"``). A copy-paste slip that
leaves the old short name on a new declaration (the round-6 ``def p16`` under
``p17_pack_efficiency``) breaks nothing functionally — the registry keys on
the declared string — but it poisons grep/traceback archaeology, so pin it.

Aliases (retired names kept for artifact continuity) intentionally do NOT
match their fn's ``__name__``; only the FIRST registered name per function
(dict insertion order puts the primary name first) is audited.
"""

from mdio_cpp_spark.plans import REGISTRY


def test_decorated_name_prefix_matches_declared_id():
    primary_by_fn: dict[int, tuple[str, object]] = {}
    for name, d in REGISTRY.items():
        primary_by_fn.setdefault(id(d.spark), (name, d.spark))
    bad = []
    for name, fn in primary_by_fn.values():
        short = fn.__name__
        if not (name == short or name.startswith(short + "_")):
            bad.append(f"{name!r} is implemented by def {short}")
    assert not bad, "declared-id / function-name drift:\n  " + "\n  ".join(bad)
