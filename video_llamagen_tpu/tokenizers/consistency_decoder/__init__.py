from .model import (CDConfig, init_cd_params, encode, decode, reconstruct,
                    decode_consistency, consistency_fn, consistency_coeffs,
                    cd_schedule)

__all__ = ["CDConfig", "init_cd_params", "encode", "decode", "reconstruct",
           "decode_consistency", "consistency_fn", "consistency_coeffs",
           "cd_schedule"]
