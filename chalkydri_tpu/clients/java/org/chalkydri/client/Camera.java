package org.chalkydri.client;

/**
 * One coprocessor camera's latest measurement — the Camera surface the
 * reference's API sketches (crates/chalkydrilibj/api/Camera.java:3-5).
 */
public final class Camera {
  private final int cameraId;
  private volatile VisionMeasurement latest;

  Camera(int cameraId) {
    this.cameraId = cameraId;
  }

  void update(VisionMeasurement m) {
    this.latest = m;
  }

  public int getId() {
    return cameraId;
  }

  /** Newest measurement from this camera (may be a heartbeat), or null. */
  public VisionMeasurement getLatest() {
    return latest;
  }

  /** Newest USABLE pose from this camera, or null. */
  public Pose2d getPose() {
    VisionMeasurement m = latest;
    if (m == null || !m.isUsable()) {
      return null;
    }
    return new Pose2d(m.x, m.y, m.rotRadians);
  }
}
