"""DSP / acoustics primitives (maps reference layer 1, audiozen/acoustics/)."""

from .spectral import (
    hann_window,
    stft,
    stft_complex,
    istft,
    istft_complex,
    mag_phase,
    frame_signal,
    num_frames,
    make_stft_pair,
)
from .mask import (
    EPSILON,
    build_complex_ideal_ratio_mask,
    compress_cirm,
    decompress_cirm,
    complex_mul,
    drop_band,
)
from .feature_norm import (
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    hybrid_norm,
    norm_wrapper,
)
from .norms import (
    compute_rms,
    norm_amplitude,
    is_clipped,
    loudness_max_norm,
    loudness_rms_norm,
    normalize_segmental_rms,
    active_rms,
    sxr2gain,
    tune_dB_FS,
    activity_detector,
)
from .io import load_wav, save_wav, load_audio, subsample, find_files
from .filterbank import bark_filter_bank, hz_to_bark, bark_to_hz
from .sslt import cart2sph, sph2cart
