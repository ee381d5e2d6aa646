"""Pure-Python classification core (no Spark imports).

``classify.classify_document`` implements WordScape's extraction semantics
over one parsed interleaved document; the Spark operators wrap it in
Arrow-batched grouped-map UDFs, and the test oracle runs it single-node.
"""
