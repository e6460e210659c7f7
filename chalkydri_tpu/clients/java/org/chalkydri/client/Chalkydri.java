package org.chalkydri.client;

import java.io.IOException;
import java.net.DatagramPacket;
import java.net.DatagramSocket;
import java.net.InetAddress;
import java.net.SocketTimeoutException;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

/**
 * Robot-side chalkydri client: the functional version of the API the
 * reference sketches (crates/chalkydrilibj/api/Chalkydri.java:6-22 —
 * getCamera, calculateRobotPose() -&gt; double[3], getRobotPose() -&gt;
 * Pose2d), speaking the 64-byte UDP wire format (WIRE_FORMAT.md).
 *
 * <pre>
 * Chalkydri vision = new Chalkydri();            // listens on :7001
 * vision.start();
 * // each robot loop:
 * vision.sendGyroAngle(gyro.getYawRadians());    // :7002 downlink
 * Pose2d p = vision.getRobotPose();              // fused, or null
 * // or feed each camera into your pose estimator:
 * for (Camera c : vision.getCameras().values()) {
 *   VisionMeasurement m = c.getLatest();
 *   if (m != null &amp;&amp; m.isUsable()) {
 *     estimator.addVisionMeasurement(...);
 *   }
 * }
 * </pre>
 */
public final class Chalkydri implements AutoCloseable {
  public static final int LISTEN_PORT = 7001; // whacknet/src/lib.rs:14
  public static final int GYRO_PORT = 7002; // whacknet/src/lib.rs:113
  /** measurements older than this are excluded from fusion (seconds) */
  public static final double STALENESS_S = 0.5;

  private final DatagramSocket rxSocket;
  private final DatagramSocket txSocket;
  private final InetAddress coprocessorAddr;
  private final Map<Integer, Camera> cameras = new ConcurrentHashMap<>();
  private final Thread rxThread;
  private volatile boolean running;

  public Chalkydri() throws IOException {
    this(LISTEN_PORT, null);
  }

  /** coprocessorAddr enables the gyro downlink (null to disable). */
  public Chalkydri(int listenPort, String coprocessorAddr) throws IOException {
    this.rxSocket = new DatagramSocket(listenPort);
    this.rxSocket.setSoTimeout(200);
    this.txSocket = new DatagramSocket();
    this.coprocessorAddr =
        coprocessorAddr == null ? null : InetAddress.getByName(coprocessorAddr);
    this.rxThread = new Thread(this::rxLoop, "chalkydri-rx");
    this.rxThread.setDaemon(true);
  }

  public void start() {
    running = true;
    rxThread.start();
  }

  private void rxLoop() {
    byte[] buf = new byte[VisionMeasurement.SIZE];
    DatagramPacket pkt = new DatagramPacket(buf, buf.length);
    while (running) {
      // receive() shrinks pkt's length to the received size and uses the
      // CURRENT length as the next max — one short stray datagram would
      // otherwise truncate every following 64-byte packet forever.
      pkt.setLength(buf.length);
      try {
        rxSocket.receive(pkt);
      } catch (SocketTimeoutException e) {
        continue;
      } catch (IOException e) {
        return;
      }
      double now = System.nanoTime() * 1e-9;
      VisionMeasurement m = VisionMeasurement.decode(buf, pkt.getLength(), now);
      if (m == null) {
        continue;
      }
      cameras.computeIfAbsent(m.cameraId, Camera::new).update(m);
    }
  }

  public Map<Integer, Camera> getCameras() {
    return cameras;
  }

  public Camera getCamera(int cameraId) {
    return cameras.get(cameraId);
  }

  /**
   * Fused field pose as [x, y, rotRadians], or null when no fresh usable
   * measurement exists. Fusion: inverse-variance (std-dev) weighted mean
   * over fresh cameras — the same rule as the Python client
   * (clients/python_client.py).
   */
  public double[] calculateRobotPose() {
    double now = System.nanoTime() * 1e-9;
    double wx = 0, wy = 0, sumWx = 0, sumWy = 0;
    double sinSum = 0, cosSum = 0, sumWr = 0;
    for (Camera c : cameras.values()) {
      VisionMeasurement m = c.getLatest();
      if (m == null || !m.isUsable() || now - m.receiveTime > STALENESS_S) {
        continue;
      }
      double gx = 1.0 / Math.max(m.stdDevX * m.stdDevX, 1e-12);
      double gy = 1.0 / Math.max(m.stdDevY * m.stdDevY, 1e-12);
      double gr = 1.0 / Math.max(m.stdDevRot * m.stdDevRot, 1e-12);
      wx += gx * m.x;
      sumWx += gx;
      wy += gy * m.y;
      sumWy += gy;
      sinSum += gr * Math.sin(m.rotRadians);
      cosSum += gr * Math.cos(m.rotRadians);
      sumWr += gr;
    }
    if (sumWx <= 0 || sumWy <= 0 || sumWr <= 0) {
      return null;
    }
    return new double[] {
      wx / sumWx, wy / sumWy, Math.atan2(sinSum / sumWr, cosSum / sumWr)
    };
  }

  /** Fused pose, or null (reference surface: Chalkydri.java:14-21). */
  public Pose2d getRobotPose() {
    double[] p = calculateRobotPose();
    return p == null ? null : new Pose2d(p[0], p[1], p[2]);
  }

  /** Stream the robot's yaw (radians) to the coprocessor (WIRE_FORMAT.md). */
  public void sendGyroAngle(double yawRadians) throws IOException {
    if (coprocessorAddr == null) {
      return;
    }
    byte[] payload =
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(yawRadians).array();
    txSocket.send(new DatagramPacket(payload, payload.length, coprocessorAddr, GYRO_PORT));
  }

  @Override
  public void close() {
    running = false;
    rxSocket.close();
    txSocket.close();
  }
}
