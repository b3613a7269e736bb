from .stft import (
    STFTConfig,
    hann_periodic, num_frames, istft_output_length, reflect_pad_center,
    stft_np, istft_np,
    frame_signal, stft_centered_batch, stft_magnitude_batch, istft_batch,
)

__all__ = [
    "STFTConfig",
    "hann_periodic", "num_frames", "istft_output_length", "reflect_pad_center",
    "stft_np", "istft_np",
    "frame_signal", "stft_centered_batch", "stft_magnitude_batch", "istft_batch",
]
