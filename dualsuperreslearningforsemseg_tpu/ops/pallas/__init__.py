from .fa_pairwise import fa_allpairs_abs_mean_pallas

__all__ = ['fa_allpairs_abs_mean_pallas']
