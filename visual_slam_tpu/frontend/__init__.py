"""Feature front-end facade: detectors, matchers, manager, tracker
(API parity with visual_slam/feature/)."""

from .features import BaseFeature2D, FastOrbFeature2D, SIFTFeature2D  # noqa: F401
from .matcher import BaseMatcher, BFMatcherHamming, BFMatcherL2, FlannMatcher  # noqa: F401
from .feature_manager import FeatureManager, feature_factory, matcher_factory  # noqa: F401
from .tracker import FeatureTracker, FeatureTrackingResult  # noqa: F401
