"""Reference-faithful extraction semantics.

One pure function per source kind, shared verbatim by:
  * the sequential oracle (``core.extract_document`` looped over rows), and
  * the distributed Ray pipeline (the same functions called inside
    ``map_batches`` UDFs / the layout actor).

Sharing the kernel is what makes the span-sequence-equality invariant
(kind, text, media_ref, order) hold bit-exactly between oracle and
engine; the *distribution* (batching, explode/reassemble, actor pools,
repartitioning) is what the Ray layer adds and what the tests verify
doesn't perturb the result.
"""

from docstrange_ray.extract.core import extract_document, extract_spans  # noqa: F401
