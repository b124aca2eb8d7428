"""Host input pipeline (replaces torch DataLoader + DistributedSampler)."""

from .loader import DataLoader, default_collate
from .base_dataset import BaseDataset
from .dns_audio import DNSAudio
from .scp_dataset import ScpDataset
from .synthetic import SyntheticNoisyDataset
