"""EER (Electron Event Representation) movie format — gated stub.

The reference converts EER via IMOD (inout/image/core.py:913). Native EER
decoding (TIFF container, compression ids 65000/65001/65002: run-length
encoded electron events with sub-pixel bits) requires sample data to
validate against; this stub documents the gap and fails loudly instead of
producing silently wrong counts. Planned for a later round.
"""


def read(path, upsampling: int = 1):
    raise NotImplementedError(
        "EER decoding is not implemented yet; convert EER movies to "
        "MRC/TIFF with IMOD or relion_convert_to_tiff for now. "
        "(Container parses with pyp_tpu.io.tiff; the event bitstream "
        "decoder lands in a later round.)"
    )
