"""Evaluation metrics (maps reference layer 3, audiozen/metric.py)."""

from .metrics import SISDR, STOI, PESQ, si_sdr_value
from .neuromorphic import compute_synops, compute_neuronops, synops_device
from .dnsmos import DNSMOS, pDNSMOS
