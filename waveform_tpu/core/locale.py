"""UI string localization.

The reference ships locale tables for en-US, it-IT, zh-CN and zh-TW
(/root/reference/data/locale/*.ini) consumed through ``obs_module_text``.
Front-ends get the same coverage here: :func:`label` resolves a property key
to its translated label, falling back to en-US then to the key itself.
Strings are this project's own phrasing, not the reference's.
"""

from __future__ import annotations

from .properties import PROPERTY_MAP

_EN = {p.key: p.label for p in PROPERTY_MAP.values()}

_ZH_CN = {
    "audio_source": "音频源", "audio_sync_offset": "音频同步偏移",
    "hide_on_silent": "静音时隐藏", "ignore_mute": "忽略静音",
    "normalize_volume": "音量归一化", "volume_target": "归一化目标",
    "max_gain": "最大增益", "display_mode": "显示样式",
    "bar_width": "柱宽", "bar_gap": "柱间距", "step_width": "阶梯高度",
    "step_gap": "阶梯间距", "min_bar_height": "最小柱高",
    "width": "宽度", "height": "高度", "log_scale": "对数频率轴",
    "mirror_freq_axis": "镜像频率轴", "radial_layout": "环形布局",
    "invert_direction": "反转方向", "deadzone": "中心空区",
    "radial_arc": "弧度", "radial_rotation": "旋转", "rounded_caps": "圆角",
    "rms_mode": "RMS 电平", "meter_buf": "音频缓冲",
    "channel_mode": "声道", "channel": "声道序号",
    "channel_spacing": "声道间距", "auto_fft_size": "自动 FFT 大小",
    "enable_large_fft": "允许大 FFT", "fft_size": "FFT 大小",
    "window": "窗函数", "sine_exponent": "正弦指数",
    "temporal_smoothing": "时间平滑", "gravity": "重力",
    "fast_peaks": "快速峰值", "interp_mode": "插值",
    "filter_mode": "平滑滤波", "filter_radius": "滤波半径",
    "cutoff_low": "低频截止", "cutoff_high": "高频截止",
    "floor": "下限", "ceiling": "上限", "slope": "斜率",
    "rolloff_q": "滚降频带", "rolloff_rate": "滚降速率",
    "render_mode": "渲染样式", "pulse_mode": "脉冲跟随",
    "color_base": "基础颜色", "color_middle": "中间颜色",
    "color_crest": "峰值颜色", "grad_ratio": "渐变比例",
    "range_middle": "中间阈值", "range_crest": "峰值阈值",
}

_ZH_TW = {
    "audio_source": "音訊來源", "audio_sync_offset": "音訊同步偏移",
    "hide_on_silent": "靜音時隱藏", "ignore_mute": "忽略靜音",
    "normalize_volume": "音量正規化", "volume_target": "正規化目標",
    "max_gain": "最大增益", "display_mode": "顯示樣式",
    "bar_width": "柱寬", "bar_gap": "柱間距", "step_width": "階梯高度",
    "step_gap": "階梯間距", "min_bar_height": "最小柱高",
    "width": "寬度", "height": "高度", "log_scale": "對數頻率軸",
    "mirror_freq_axis": "鏡像頻率軸", "radial_layout": "環形佈局",
    "invert_direction": "反轉方向", "deadzone": "中心空區",
    "radial_arc": "弧度", "radial_rotation": "旋轉", "rounded_caps": "圓角",
    "rms_mode": "RMS 電平", "meter_buf": "音訊緩衝",
    "channel_mode": "聲道", "channel": "聲道序號",
    "channel_spacing": "聲道間距", "auto_fft_size": "自動 FFT 大小",
    "enable_large_fft": "允許大 FFT", "fft_size": "FFT 大小",
    "window": "窗函數", "sine_exponent": "正弦指數",
    "temporal_smoothing": "時間平滑", "gravity": "重力",
    "fast_peaks": "快速峰值", "interp_mode": "插值",
    "filter_mode": "平滑濾波", "filter_radius": "濾波半徑",
    "cutoff_low": "低頻截止", "cutoff_high": "高頻截止",
    "floor": "下限", "ceiling": "上限", "slope": "斜率",
    "rolloff_q": "滾降頻帶", "rolloff_rate": "滾降速率",
    "render_mode": "渲染樣式", "pulse_mode": "脈衝跟隨",
    "color_base": "基礎顏色", "color_middle": "中間顏色",
    "color_crest": "峰值顏色", "grad_ratio": "漸變比例",
    "range_middle": "中間閾值", "range_crest": "峰值閾值",
}

_IT = {
    "audio_source": "Sorgente audio", "audio_sync_offset": "Ritardo audio",
    "hide_on_silent": "Nascondi se silenzioso",
    "ignore_mute": "Ignora il muto",
    "normalize_volume": "Normalizza il volume",
    "volume_target": "Volume di riferimento", "max_gain": "Guadagno massimo",
    "display_mode": "Stile di visualizzazione", "bar_width": "Larghezza barre",
    "bar_gap": "Spaziatura barre", "step_width": "Altezza gradini",
    "step_gap": "Spaziatura gradini", "min_bar_height": "Altezza minima",
    "width": "Larghezza", "height": "Altezza",
    "log_scale": "Asse logaritmico",
    "mirror_freq_axis": "Specchia l'asse delle frequenze",
    "radial_layout": "Disposizione radiale",
    "invert_direction": "Inverti direzione", "deadzone": "Zona morta",
    "radial_arc": "Arco", "radial_rotation": "Rotazione",
    "rounded_caps": "Estremità arrotondate", "rms_mode": "Livello RMS",
    "meter_buf": "Buffer audio", "channel_mode": "Canali",
    "channel": "Indice canale", "channel_spacing": "Spaziatura canali",
    "auto_fft_size": "Dimensione FFT automatica",
    "enable_large_fft": "Consenti FFT grandi", "fft_size": "Dimensione FFT",
    "window": "Funzione finestra", "sine_exponent": "Esponente del seno",
    "temporal_smoothing": "Livellamento temporale", "gravity": "Gravità",
    "fast_peaks": "Picchi rapidi", "interp_mode": "Interpolazione",
    "filter_mode": "Filtro di livellamento", "filter_radius": "Raggio filtro",
    "cutoff_low": "Taglio basso", "cutoff_high": "Taglio alto",
    "floor": "Minimo", "ceiling": "Massimo", "slope": "Pendenza",
    "rolloff_q": "Banda di attenuazione", "rolloff_rate": "Attenuazione",
    "render_mode": "Stile di resa", "pulse_mode": "Tracciamento impulso",
    "color_base": "Colore di base", "color_middle": "Colore intermedio",
    "color_crest": "Colore di picco", "grad_ratio": "Rapporto gradiente",
    "range_middle": "Soglia intermedia", "range_crest": "Soglia di picco",
}

LOCALES: dict[str, dict[str, str]] = {
    "en-US": _EN,
    "zh-CN": _ZH_CN,
    "zh-TW": _ZH_TW,
    "it-IT": _IT,
}


def label(key: str, locale: str = "en-US") -> str:
    table = LOCALES.get(locale, _EN)
    return table.get(key, _EN.get(key, key))


def tooltip(key: str, locale: str = "en-US") -> str:
    """Tooltip text for a property key (en-US authored; the reference's
    locale ini carries per-language tooltips — non-English falls back to
    en-US here, mirroring OBS's missing-key fallback)."""
    from .properties import PROPERTY_MAP
    p = PROPERTY_MAP.get(key)
    return p.tooltip if p is not None else ""
