from .encode import encode_dataset, load_manifest
from .decode import decode_dataset
