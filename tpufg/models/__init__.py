from tpufg.models.pyramid import pyramid_motion_search
