"""Pure-Python extraction core — the single-node oracle.

Every function here is deterministic, Spark-free and numpy/pandas-friendly.
The Spark operators in ``frogocr_spark.operators`` wrap these same functions
inside Arrow-batched operators (``mapInArrow`` for extraction,
``mapInPandas`` elsewhere), so Spark output == oracle output
byte-for-byte by construction; pytest verifies it anyway (tests/).

Module map (reference citations inside each module):

- ``sniff``       payload-format classification (codec choice analog)
- ``segment``     XY-cut / band reading-order recovery for layout payloads
- ``boilerplate`` text-density / link-density block classification (HTML)
- ``markdown``    markup strip with span tracking
- ``tooljson``    structured tool-output field extraction
- ``secondpass``  low-confidence region re-extraction + overlap merge
- ``assemble``    span-level text assembly + empty-cascade pruning
- ``extract``     per-turn dispatch + batch (pandas) entry point
"""
