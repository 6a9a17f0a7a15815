"""L2 data layer: corpus → vocabulary → windows → instance shards → device feed.

Mirrors the reference's "prepare" pipeline (SURVEY.md section 4.1): parse,
tokenize, build a top-N vocabulary, load entity-document associations, sweep
fixed-width word windows, and serialize shuffled instance shards to disk.
Everything here is host-side (numpy / C++); arrays handed to the device are
exactly-shaped int32 batches.
"""

from sert_tpu.data.tokenize import tokenize  # noqa: F401
from sert_tpu.data.vocab import Vocabulary  # noqa: F401
from sert_tpu.data.assoc import EntityRegistry, Associations  # noqa: F401
from sert_tpu.data.windows import extract_windows  # noqa: F401
from sert_tpu.data.instances import InstanceWriter, InstanceDataset  # noqa: F401
from sert_tpu.data.synthetic import SyntheticCollection, make_synthetic  # noqa: F401
