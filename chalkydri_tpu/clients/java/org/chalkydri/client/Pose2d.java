package org.chalkydri.client;

/**
 * Minimal field-relative pose so this client compiles with a bare javac.
 * In robot code convert to WPILib with:
 * {@code new edu.wpi.first.math.geometry.Pose2d(p.x, p.y,
 *        edu.wpi.first.math.geometry.Rotation2d.fromRadians(p.rotationRadians))}
 */
public final class Pose2d {
  public final double x;
  public final double y;
  public final double rotationRadians;

  public Pose2d(double x, double y, double rotationRadians) {
    this.x = x;
    this.y = y;
    this.rotationRadians = rotationRadians;
  }

  @Override
  public String toString() {
    return String.format("Pose2d(%.3f, %.3f, %.3f rad)", x, y, rotationRadians);
  }
}
