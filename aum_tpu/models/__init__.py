from aum_tpu.models.mamba import MambaMixer, MambaBlock
from aum_tpu.models.audio_mamba import AudioMamba, AudioMambaConfig

__all__ = ["MambaMixer", "MambaBlock", "AudioMamba", "AudioMambaConfig"]
