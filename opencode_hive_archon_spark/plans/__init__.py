"""Plan-construction layer: routing policy, branch classification, scenarios.

Routing is deliberately driver-side Python (SURVEY.md §4: "configuration,
not expression rewriting") — it picks which source DataFrame is scanned and
whether the rerank stage is planned at all. Branch classification is a
reusable ``when()`` cascade evaluated JVM-side over the aggregate row.
"""
